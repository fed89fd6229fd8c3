from webgraph_algo_rs_spark.operators.degrees import degrees  # noqa: F401
from webgraph_algo_rs_spark.operators.pagerank import pagerank  # noqa: F401
from webgraph_algo_rs_spark.operators.components import (  # noqa: F401
    connected_components,
    renumber_by_size,
)
from webgraph_algo_rs_spark.operators.label_propagation import label_propagation  # noqa: F401
from webgraph_algo_rs_spark.operators.triangles import (  # noqa: F401
    triangle_count_global,
    triangle_count_per_vertex,
)
from webgraph_algo_rs_spark.operators.bfs import bfs_distances  # noqa: F401
from webgraph_algo_rs_spark.operators.dfs import dfs_forest  # noqa: F401
from webgraph_algo_rs_spark.operators.topsort import kahn_layers, is_acyclic  # noqa: F401
from webgraph_algo_rs_spark.operators.hyperball import (  # noqa: F401
    hyperball,
    neighbourhood_function,
)
from webgraph_algo_rs_spark.operators.scc import (  # noqa: F401
    radial_vertices,
    scc_condensation,
    strongly_connected_components,
)
from webgraph_algo_rs_spark.operators.sumsweep import (  # noqa: F401
    diameter_directed,
    diameter_undirected,
    directed_eccentricities,
    eccentricities,
    forward_eccentricities,
    radius_diameter,
    radius_diameter_directed,
    radius_directed,
    radius_undirected,
)
from webgraph_algo_rs_spark.operators.checks import (  # noqa: F401
    is_symmetric,
    is_transpose_of,
)
