from webgraph_algo_rs_spark.sources.transcripts import gen_transcripts  # noqa: F401
from webgraph_algo_rs_spark.sources.tables import load_table, events_user_edges  # noqa: F401
from webgraph_algo_rs_spark.sources.rmat import (  # noqa: F401
    rmat_edge_arrays,
    rmat_edges,
    rmat_like_in2004,
)
