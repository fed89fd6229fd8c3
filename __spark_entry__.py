"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship per-vertex graph summary on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 / §2.7
plus the training-data pipeline ops); each callable ``(spark, sf_dir) →
DataFrame``.
``oracle_sql()`` — exact DuckDB ANSI-SQL twins for every
SQL-expressible query (PageRank/LPA/BFS via recursive CTEs; MinHash,
SimHash and LSH-ANN embed their seeded hash/hyperplane families as SQL
literals; HyperBall replays its splitmix64 HLL sketches bit-exactly in
HUGEINT SQL over recursive-CTE exact distances — every query has an
oracle).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------- helpers

def _events_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.sources.tables import events_user_edges

    return events_user_edges(spark, sf_dir)


# shared DuckDB CTE: the events-derived user interaction graph
_EG = """
WITH RECURSIVE ordered AS (
  SELECT user_id, lag(user_id) OVER (ORDER BY ts, event_id) AS prev_user
  FROM events
), eg AS (
  SELECT prev_user AS src_vertex, user_id AS dst_vertex,
         CAST(count(*) AS DOUBLE) AS weight
  FROM ordered
  WHERE prev_user IS NOT NULL AND prev_user <> user_id
  GROUP BY 1, 2
), sym AS (
  SELECT DISTINCT s, d FROM (
    SELECT src_vertex AS s, dst_vertex AS d FROM eg
    UNION ALL
    SELECT dst_vertex, src_vertex FROM eg
  )
), verts AS (
  -- NB: inside WITH RECURSIVE DuckDB does not dedup a plain UNION here;
  -- dedup explicitly
  SELECT DISTINCT v FROM (
    SELECT src_vertex AS v FROM eg UNION ALL SELECT dst_vertex FROM eg
  )
), und AS (
  SELECT least(src_vertex, dst_vertex) AS a,
         greatest(src_vertex, dst_vertex) AS b
  FROM eg WHERE src_vertex <> dst_vertex
  GROUP BY 1, 2
)
"""

# Transcript-graph CTE: regenerates the arithmetic-deterministic
# transcript table (sources.transcripts.sql_transcripts) and replays the
# extraction pipeline — reply edges (per-conv lag), tool edges, dense
# vertex dictionary ordered by key — producing edge CTE ``teg`` and
# vertex CTE ``tverts(v)``.
def _transcript_graph_sql(n_convs: int = 300) -> str:
    from webgraph_algo_rs_spark.sources.transcripts import sql_transcripts_duckdb

    return (
        "WITH RECURSIVE "
        + sql_transcripts_duckdb(n_convs).strip().lstrip()
        + """
, auth AS (
  SELECT conv_id, turn_idx, tool, conv_id || '/' || role AS akey
  FROM transcripts_sql
), reply AS (
  SELECT src_key, dst_key FROM (
    SELECT lag(akey) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS src_key,
           akey AS dst_key
    FROM auth
  ) WHERE src_key IS NOT NULL
), tooling AS (
  SELECT akey AS src_key, 'tool/' || tool AS dst_key FROM auth WHERE tool IS NOT NULL
), allkeys AS (
  SELECT DISTINCT akey AS key FROM auth
  UNION
  SELECT DISTINCT 'tool/' || tool FROM auth WHERE tool IS NOT NULL
), dict AS (
  SELECT key, CAST(row_number() OVER (ORDER BY key) - 1 AS BIGINT) AS vid FROM allkeys
), teg AS (
  SELECT ds.vid AS src_vertex, dd.vid AS dst_vertex, a.weight
  FROM (SELECT src_key, dst_key, CAST(count(*) AS DOUBLE) AS weight
        FROM (SELECT * FROM reply UNION ALL SELECT * FROM tooling)
        GROUP BY 1, 2) a
  JOIN dict ds ON a.src_key = ds.key
  JOIN dict dd ON a.dst_key = dd.key
), tverts AS (
  SELECT DISTINCT v FROM (
    SELECT src_vertex AS v FROM teg UNION ALL SELECT dst_vertex FROM teg
  )
)"""
    )


def _pagerank_sql(edge_cte: str, verts_cte: str, iters: int = 30, d: float = 0.85) -> str:
    """Fixed-iteration weighted PageRank with dangling-mass
    redistribution as a DuckDB recursive CTE — operand-for-operand the
    formula of operators/pagerank.py (teleport + d·(contrib + dm/n)),
    so float results agree to well under the gate's 9-sig-fig rounding.
    Literals are cast to DOUBLE (DuckDB parses bare decimals as DECIMAL,
    which would change the arithmetic)."""
    dd, omd = repr(float(d)), repr(1.0 - float(d))
    return f"""
, pr_ow AS (SELECT src_vertex AS s, sum(weight) AS ow FROM {edge_cte} GROUP BY 1)
, pr_ne AS (SELECT e.src_vertex AS s, e.dst_vertex AS dst, e.weight / o.ow AS nw
            FROM {edge_cte} e JOIN pr_ow o ON e.src_vertex = o.s)
, pr_v AS (SELECT v, (v NOT IN (SELECT s FROM pr_ow)) AS dangling FROM {verts_cte})
, pr_n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM pr_v)
, pr(it, v, dangling, rank) AS (
  SELECT 0, v, dangling, CAST(1.0 AS DOUBLE) / (SELECT n FROM pr_n) FROM pr_v
  UNION ALL
  SELECT p.it + 1, p.v, p.dangling,
         CAST({omd} AS DOUBLE) / (SELECT n FROM pr_n)
         + CAST({dd} AS DOUBLE) * (coalesce(c.contrib, CAST(0.0 AS DOUBLE))
             + (SELECT coalesce(sum(rank) FILTER (WHERE dangling), 0.0) FROM pr)
               / (SELECT n FROM pr_n))
  FROM pr p
  LEFT JOIN (SELECT ne.dst, sum(p2.rank * ne.nw) AS contrib
             FROM pr p2 JOIN pr_ne ne ON p2.v = ne.s GROUP BY ne.dst) c
    ON p.v = c.dst
  WHERE p.it < {iters}
)
SELECT v AS vertex, rank FROM pr WHERE it = {iters}
"""


def _lpa_sql(edge_cte: str, verts_cte: str, iters: int = 10) -> str:
    """Synchronous weight-majority label propagation (min-label
    tie-break) as a fixed-iteration recursive CTE. The Spark operator
    stops early at a fixpoint; running the CTE the full ``iters`` rounds
    is equivalent because a fixpoint is stable under further synchronous
    updates."""
    return f"""
, symw AS (
  SELECT s, d, sum(w) AS w FROM (
    SELECT src_vertex AS s, dst_vertex AS d, weight AS w FROM {edge_cte}
    UNION ALL
    SELECT dst_vertex, src_vertex, weight FROM {edge_cte}
  ) GROUP BY s, d
), lpa(it, v, label) AS (
  SELECT 0, v, v FROM {verts_cte}
  UNION ALL
  SELECT it + 1, dst, label FROM (
    SELECT l.it AS it, e.d AS dst, l.label AS label, sum(e.w) AS ws
    FROM lpa l JOIN symw e ON l.v = e.s
    WHERE l.it < {iters}
    GROUP BY l.it, e.d, l.label
  ) QUALIFY row_number() OVER (PARTITION BY dst ORDER BY ws DESC, label ASC) = 1
)
SELECT v AS vertex, CAST(label AS BIGINT) AS label FROM lpa WHERE it = {iters}
"""


# DuckDB shingle + minhash fragments (word 3-grams; one md5 per shingle
# split into 32-bit halves, affine family (a + i·b) mod 2^32 — mirrors
# functions/dedup.py exactly)
_SHINGLES = """
  [array_to_string(toks[i:i+2], ' ')
   for i in generate_series(1, greatest(len(toks) - 2, 1))]
"""


def _mh_sql(i: int) -> str:
    return (
        f"list_min([(('0x' || substr(h, 1, 8))::BIGINT"
        f" + {i} * ('0x' || substr(h, 9, 8))::BIGINT) % 4294967296 for h in hx])"
    )


_DOCS_SH = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
), shingled AS (
  SELECT doc_id, {_SHINGLES} AS sh FROM t
), hashed AS (
  SELECT doc_id, sh, [md5(s) for s in sh] AS hx FROM shingled
)
"""


def _hyperball_prefix_sql() -> str:
    """DuckDB twin of ``operators.hyperball`` (log2m=8, seed 42,
    splitmix64, run to stabilization) — the shared replay prefix ending
    at ``est3(vertex, t, est)``, the per-vertex ball estimate at every
    superstep; the centralities and neighbourhood-function oracles put
    different tails on it.

    HyperBall's max-merge is lossless for HLL registers — the sketch of
    a union IS the elementwise max — so after ``t`` supersteps every
    vertex's sketch equals the registers of its *exact* forward ball
    ``B_t(v)``, which SQL can compute from recursive-CTE distances. The
    splitmix64 hash is replayed bit-exactly in HUGEINT arithmetic
    (mod-2^64 after every step; the 64x64-bit multiply is split into
    32-bit halves so no product exceeds int128), and the register math
    (j = h & 255, rho = ctz((h >> 8) | 2^63) + 1, harmonic-mean
    estimate with linear-counting correction, per-superstep clamped
    deltas) mirrors ``functions/hll.py:154-194`` /
    ``operators/hyperball.py:230-249`` exactly; float sums agree to
    ~1e-16, far inside the harness's 9-significant-digit rounding."""
    P, B = 1 << 64, 1 << 32
    c0 = (43 * 0x9E3779B97F4A7C15) % P  # (seed+1)*gamma mod 2^64, seed 42
    m1, m2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB
    sent = 1 << 63

    def mulmod(const: int) -> str:
        lo, hi = const % B, const >> 32
        return (
            f"((z % {B}) * {lo}"
            f" + (((z % {B}) * {hi} + (z >> 32) * {lo}) % {B}) * {B}) % {P}"
        )

    return f"""
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
), distf AS (SELECT s, v, min(d) AS d FROM rf GROUP BY s, v)
, h0 AS (SELECT v AS u, (CAST(v AS HUGEINT) + {c0}) % {P} AS z FROM verts)
, h1 AS (SELECT u, xor(z, z >> 30) AS z FROM h0)
, h2 AS (SELECT u, {mulmod(m1)} AS z FROM h1)
, h3 AS (SELECT u, xor(z, z >> 27) AS z FROM h2)
, h4 AS (SELECT u, {mulmod(m2)} AS z FROM h3)
, hh AS (SELECT u, xor(z, z >> 31) AS h FROM h4)
, rr AS (SELECT u, h, CAST(h % 256 AS INT) AS j, (h >> 8) | {sent} AS x FROM hh)
, reg0 AS (SELECT u, j,
           CAST(round(log2(CAST((x & (-x)) AS DOUBLE))) AS INT) + 1 AS rho
           FROM rr)
, ts AS (SELECT unnest(range(0, (SELECT CAST(max(d) AS BIGINT) FROM distf) + 1)) AS t)
, ball AS (
  SELECT d.s AS vertex, ts.t, r.j, max(r.rho) AS reg
  FROM distf d JOIN reg0 r ON d.v = r.u JOIN ts ON d.d <= ts.t
  GROUP BY d.s, ts.t, r.j
), est1 AS (
  SELECT vertex, t, count(*) AS present, sum(power(2.0, -reg)) AS harmp
  FROM ball GROUP BY vertex, t
), est2 AS (
  SELECT vertex, t, 256 - present AS zeros,
         0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
           / (harmp + (256 - present)) AS raw
  FROM est1
), est3 AS (
  SELECT vertex, t,
         CASE WHEN raw < 2.5 * 256.0 AND zeros > 0
              THEN 256.0 * ln(256.0 / zeros) ELSE raw END AS est
  FROM est2
)"""


def _hyperball_sql() -> str:
    """Centralities tail over the shared replay prefix (see
    :func:`_hyperball_prefix_sql` for the bit-exact HLL mechanics)."""
    return _hyperball_prefix_sql() + """
, deltas AS (
  SELECT vertex, t, est,
         greatest(est - lag(est) OVER (PARTITION BY vertex ORDER BY t), 0.0) AS delta
  FROM est3
), accum AS (
  SELECT vertex,
         arg_max(est, t) AS reachable,
         coalesce(sum(t * delta) FILTER (t > 0), 0.0) AS sum_d,
         coalesce(sum(delta / t) FILTER (t > 0), 0.0) AS sum_inv_d
  FROM deltas GROUP BY vertex
)
SELECT CAST(vertex AS BIGINT) AS vertex, reachable, sum_d AS sum_distances,
       CASE WHEN sum_d = 0.0 THEN 0.0 ELSE 1.0 / sum_d END AS closeness,
       sum_inv_d AS harmonic,
       CASE WHEN sum_d = 0.0 THEN 1.0 ELSE reachable * reachable / sum_d END AS lin,
       reachable * reachable - sum_d AS nieminen
FROM accum
"""


def _hyperball_nf_sql() -> str:
    """Neighbourhood-function tail: N(t) = running max of Σ_v est(v,t)
    (the operator's monotone clamp, `operators/hyperball.py:362`), both
    engines rounded to 6 decimals (global float sums reorder across
    engines at ~1e-15 relative — the round makes the hash compare exact)
    and truncated at the last strict increase (the Spark loop appends
    one final equal entry at its changed==0 fixpoint; registers are a
    fixpoint from the first equal pair on, so dropping equals ends both
    engines at the same t)."""
    return _hyperball_prefix_sql() + """
, nfs AS (SELECT t, sum(est) AS s FROM est3 GROUP BY t)
, nfm AS (SELECT t, round(max(s) OVER (ORDER BY t), 6) AS nf FROM nfs)
, nfk AS (SELECT t, nf, lag(nf) OVER (ORDER BY t) AS pnf FROM nfm)
SELECT CAST(t AS BIGINT) AS t, nf FROM nfk WHERE pnf IS NULL OR nf > pnf
"""


# ---------------------------------------------------------------- queries

def q_edges_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _events_edges(spark, sf_dir)


def q_degrees_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import degrees

    return degrees(_events_edges(spark, sf_dir))


def q_cc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import connected_components

    return connected_components(_events_edges(spark, sf_dir))


def q_cc_events_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same CC query with ``local_mode=False``: the DuckDB hash gate
    certifies the DISTRIBUTED hash-min superstep plan directly (every
    gate graph is under the local-CSR dispatch threshold, so without
    this pin the gate only ever exercises the single-task kernel —
    VERDICT r4 'What's wrong' §2). Plan-level proof that this takes the
    distributed path is in tests/test_algorithms.py (dispatch tests);
    here the pin itself is the guarantee."""
    from webgraph_algo_rs_spark.operators import connected_components

    return connected_components(_events_edges(spark, sf_dir), local_mode=False)


def q_pagerank_events_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank with ``local_mode=False`` — hash-gates
    the distributed blocked-superstep plan (see q_cc_events_dist)."""
    from webgraph_algo_rs_spark.operators import pagerank

    return pagerank(
        _events_edges(spark, sf_dir), tol=0.0, max_iter=30, local_mode=False
    )


def q_hyperball_events_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall with ``local_mode=False`` — hash-gates the distributed
    sketch-merge superstep plan (see q_cc_events_dist)."""
    from webgraph_algo_rs_spark.operators import hyperball

    return hyperball(_events_edges(spark, sf_dir), log2m=8, local_mode=False)


def _sf01_dir() -> str:
    import os

    return os.environ.get("WGA_SF01_DIR", "/root/testdata/sf0.1")


def q_cc_events_sf01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the sf0.1 events graph (~1.5k vertices,
    97k edges) — deliberately IGNORES the passed ``sf_dir``: the
    correctness gate runs at sf0.01, whose 150-vertex graph is a toy;
    this query extends hash-matched coverage to a non-toy graph
    (VERDICT r3 §next №7). The oracle reads the same parquet via
    ``read_parquet`` instead of the sf0.01 view."""
    from webgraph_algo_rs_spark.operators import connected_components

    return connected_components(_events_edges(spark, _sf01_dir()))


def q_cc_sizes_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import connected_components
    from webgraph_algo_rs_spark.operators.components import component_sizes

    return component_sizes(connected_components(_events_edges(spark, sf_dir)))


def q_triangles_global_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import triangle_count_global

    return triangle_count_global(_events_edges(spark, sf_dir))


def q_triangles_vertex_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import triangle_count_per_vertex

    return triangle_count_per_vertex(_events_edges(spark, sf_dir))


def q_top_inweight_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import degrees

    return (
        degrees(_events_edges(spark, sf_dir))
        .orderBy(F.desc("in_weight"), F.asc("vertex"))
        .limit(10)
        .select("vertex", "in_weight")
    )


def q_bfs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import bfs_distances
    from webgraph_algo_rs_spark.plans.superstep import graph_vertices

    edges = _events_edges(spark, sf_dir)
    source = graph_vertices(edges).agg(F.min("vertex")).first()[0]
    return bfs_distances(edges, [int(source)]).select("vertex", "distance")


def q_dfs_tree_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential DFS forest (SURVEY §2 T4, reference
    `depth_first/seq.rs:319-382`) over a deterministic 3-ary tree whose
    size both engines derive from the events row count. On a tree the
    visit order is SQL-expressible — preorder sorts zero-padded root
    paths, postorder sorts the same paths with a high sentinel appended
    (descendants sort before their ancestor) — which gives the
    inherently sequential operator a hash-matched oracle; general-digraph
    parity is pinned in tests/test_dfs.py against a pure-Python replay."""
    from webgraph_algo_rs_spark.operators import dfs_forest
    from webgraph_algo_rs_spark.sources.tables import load_table

    n = min(load_table(spark, sf_dir, "events").count(), 4095)
    edges = spark.range(1, n).select(
        F.floor((F.col("id") - 1) / 3).cast("long").alias("src_vertex"),
        F.col("id").cast("long").alias("dst_vertex"),
        F.lit(1.0).alias("weight"),
    )
    return dfs_forest(edges).select(
        "vertex", "root", "parent", "depth", "pre", "post"
    )


def q_pagerank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration form (tol=0, 30 supersteps) so the DuckDB
    recursive-CTE oracle replays the identical computation; the
    convergence-stop form (tol=1e-6) is verified in tests/ against the
    numpy oracle and exercised by bench.py."""
    from webgraph_algo_rs_spark.operators import pagerank

    return pagerank(_events_edges(spark, sf_dir), tol=0.0, max_iter=30)


def q_lpa_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import label_propagation

    return label_propagation(_events_edges(spark, sf_dir), max_iter=10)


def q_edges_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.sources.tables import customer_supplier_edges

    return customer_supplier_edges(spark, sf_dir)


def q_kahn_layers_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import kahn_layers
    from webgraph_algo_rs_spark.sources.tables import customer_supplier_edges

    return kahn_layers(customer_supplier_edges(spark, sf_dir))


def q_transcript_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-rule extraction pipeline (reply + tool edges, dense vertex
    dictionary) over the arithmetic-deterministic transcript source that
    the DuckDB oracle regenerates formula-for-formula. The Zipf-skewed
    RNG source is exercised in tests/test_extraction.py (pandas oracle)
    and bench.py."""
    from webgraph_algo_rs_spark.extraction import extract_edges
    from webgraph_algo_rs_spark.sources.transcripts import sql_transcripts

    return extract_edges(sql_transcripts(spark, 300))


def q_pagerank_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the extracted transcript graph
    (see q_pagerank_events for why the gate form pins iterations)."""
    from webgraph_algo_rs_spark.extraction import extract_edges
    from webgraph_algo_rs_spark.operators import pagerank
    from webgraph_algo_rs_spark.sources.transcripts import sql_transcripts

    edges = extract_edges(sql_transcripts(spark, 300))
    return pagerank(edges, tol=0.0, max_iter=30)


def q_scc_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import strongly_connected_components

    return strongly_connected_components(_events_edges(spark, sf_dir))


def q_scc_condensation_cust_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Condensation of the bipartite customer→supplier graph — every
    vertex is a singleton SCC, so the DAG keeps all cross arcs (the
    events graph at sf0.01 collapses to one SCC → empty DAG, a
    worthless check)."""
    from webgraph_algo_rs_spark.operators import (
        scc_condensation,
        strongly_connected_components,
    )
    from webgraph_algo_rs_spark.sources.tables import customer_supplier_edges

    edges = customer_supplier_edges(spark, sf_dir).localCheckpoint(eager=True)
    return scc_condensation(edges, strongly_connected_components(edges)).select(
        "c_src", "c_dst", "n_arcs"
    )


def q_symmetry_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import is_symmetric
    from webgraph_algo_rs_spark.plans.superstep import symmetrize

    edges = _events_edges(spark, sf_dir)
    return spark.createDataFrame(
        [(is_symmetric(edges), is_symmetric(symmetrize(edges)))],
        "directed_is_symmetric boolean, symmetrized_is_symmetric boolean",
    )


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import embedding_near_dup_pairs
    from webgraph_algo_rs_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.4).select("id_a", "id_b")


def q_eccentricities_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import eccentricities

    return eccentricities(_events_edges(spark, sf_dir)).select("vertex", "ecc")


def q_radius_diameter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.operators import radius_diameter

    return radius_diameter(_events_edges(spark, sf_dir))


def q_radius_diameter_fast_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected RadiusDiameter at output level RadiusDiameter (the
    reference's early-stop level, `output_level.rs:290-451`): stops as
    soon as diameter = max(low) is not exceeded by any upper bound and
    radius = min(high) is not undercut by any lower bound. Witnesses are
    attained-but-tie-unspecified, so the oracle compares values only."""
    from webgraph_algo_rs_spark.operators import radius_diameter

    return radius_diameter(
        _events_edges(spark, sf_dir), output_level="radius_diameter"
    ).select("radius", "diameter")


def q_acyclicity_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acyclicity check (reference `src/algo/acyclicity.rs:9-30`,
    re-expressed as the Kahn peel emptying the graph): the events reply
    graph has back-and-forth user pairs, so the expected answer is
    false. One boolean row; the DuckDB twin asks whether any vertex
    reaches itself through >= 1 arc."""
    from webgraph_algo_rs_spark.operators import is_acyclic

    return spark.createDataFrame(
        [(bool(is_acyclic(_events_edges(spark, sf_dir))),)],
        "is_acyclic boolean",
    )


def q_diameter_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected single-scalar Diameter level (reference
    ``Diameter::compute_undirected``, `output_level.rs:290-360`): only
    the diameter-side open set is targeted; the witness is attained but
    tie-unspecified at early stop, so the oracle compares the value."""
    from webgraph_algo_rs_spark.operators import diameter_undirected

    return diameter_undirected(_events_edges(spark, sf_dir)).select("diameter")


def q_radius_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected single-scalar Radius level (reference
    ``Radius::compute_undirected``, `output_level.rs:362-451`).

    DECLARED DIVERGENCE: min eccentricity over ALL vertices. The
    reference restricts the undirected radius to radial vertices of the
    biggest component (`computer.rs:488-534`), so on a DISCONNECTED
    graph the values can differ; the DuckDB twin encodes this query's
    all-vertices semantics, on purpose."""
    from webgraph_algo_rs_spark.operators import radius_undirected

    return radius_undirected(_events_edges(spark, sf_dir)).select("radius")


def q_diameter_directed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed single-scalar Diameter level (reference
    ``Diameter::compute_directed``, `output_level.rs:66-150`): certifies
    D_L = max(max low_f, max low_b) from whichever side empties first;
    never computes the radial set."""
    from webgraph_algo_rs_spark.operators import diameter_directed

    return diameter_directed(_events_edges(spark, sf_dir)).select("diameter")


def q_radius_directed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed single-scalar Radius level (reference
    ``Radius::compute_directed``, `output_level.rs:152-243`): radius =
    min ecc_f over the radial set; the diameter side is never
    targeted."""
    from webgraph_algo_rs_spark.operators import radius_directed

    return radius_directed(_events_edges(spark, sf_dir)).select("radius")


def q_ecc_forward_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed AllForward level (reference `output_level.rs:24-38`):
    every forward eccentricity closed exactly, backward never
    certified. Per-vertex exact output, so the oracle hashes all
    rows."""
    from webgraph_algo_rs_spark.operators import forward_eccentricities

    return forward_eccentricities(_events_edges(spark, sf_dir)).select(
        "vertex", "ecc_f"
    )


def q_ecc_directed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed ExactSumSweep, output level All (forward/backward
    eccentricities with reachable-set semantics)."""
    from webgraph_algo_rs_spark.operators import directed_eccentricities

    return directed_eccentricities(_events_edges(spark, sf_dir)).select(
        "vertex", "ecc_f", "ecc_b"
    )


def q_radius_diameter_directed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed RadiusDiameter with radial-vertex gating (radius over
    vertices reaching the largest SCC). Output level All: every vertex
    closed, so the min-id witness rule is deterministic and the oracle
    hash covers the witness columns too."""
    from webgraph_algo_rs_spark.operators import radius_diameter_directed

    return radius_diameter_directed(_events_edges(spark, sf_dir), output_level="all")


def q_radius_diameter_directed_fast_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed RadiusDiameter at output level RadiusDiameter (the
    reference's actual level, `output_level.rs:247-287`): terminates as
    soon as both scalars are bound-certified instead of closing every
    vertex. Witness vertices are attained-but-tie-unspecified, so the
    oracle compares the two certified values only."""
    from webgraph_algo_rs_spark.operators import radius_diameter_directed

    return radius_diameter_directed(_events_edges(spark, sf_dir)).select(
        "radius", "diameter"
    )


def q_hyperball_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch geometric centralities. Oracle-checked: HyperBall's
    max-merge is lossless, so the deterministic splitmix64 sketches are
    SQL-replayable over exact recursive-CTE distances (see
    ``_hyperball_sql``); accuracy is additionally verified in
    tests/test_hyperball.py vs the exact
    all-pairs BFS oracle)."""
    from webgraph_algo_rs_spark.operators import hyperball

    return hyperball(_events_edges(spark, sf_dir), log2m=8)


def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import exact_duplicates
    from webgraph_algo_rs_spark.sources.tables import load_table

    return exact_duplicates(load_table(spark, sf_dir, "documents"))


def q_token_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import token_counts
    from webgraph_algo_rs_spark.sources.tables import load_table

    return token_counts(load_table(spark, sf_dir, "documents"))


def q_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import quality_scores
    from webgraph_algo_rs_spark.sources.tables import load_table

    return quality_scores(load_table(spark, sf_dir, "documents"))


def q_langid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import language_id
    from webgraph_algo_rs_spark.sources.tables import load_table

    return language_id(load_table(spark, sf_dir, "documents"))


def q_fingerprints_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import fingerprints
    from webgraph_algo_rs_spark.sources.tables import load_table

    return fingerprints(load_table(spark, sf_dir, "documents"))


def q_minhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import minhash_signatures
    from webgraph_algo_rs_spark.sources.tables import load_table

    sigs = minhash_signatures(load_table(spark, sf_dir, "documents"), n_hashes=4)
    return sigs.select(
        "doc_id", *[F.col("sig")[i].alias(f"mh{i}") for i in range(4)]
    )


def q_lsh_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import lsh_candidate_pairs
    from webgraph_algo_rs_spark.sources.tables import load_table

    return lsh_candidate_pairs(
        load_table(spark, sf_dir, "documents"), n_hashes=8, bands=4
    )


def q_jaccard_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import ngram_jaccard_pairs
    from webgraph_algo_rs_spark.sources.tables import load_table

    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def q_simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import simhash64
    from webgraph_algo_rs_spark.sources.tables import load_table

    return simhash64(load_table(spark, sf_dir, "documents"))


def _synth_media_payloads(spark: SparkSession, sf_dir: str, decode_corpus: bool):
    """Deterministic rule-derived media corpus over ``documents``:
    every payload is synthesized from ``doc_id`` alone, so the probe /
    decode *outputs* are computable in pure SQL without any decoding —
    that is what makes the multimodal path oracle-checkable.

    ``decode_corpus=False``: header-only payloads cycling through
    bmp/png/gif/jpeg/wav/corrupt (``doc_id % 6``) with every fifth doc
    mislabeled (declared width / duration off by one).
    ``decode_corpus=True``: full constant-color 5×3 24-bit BMPs
    (gray value ``doc_id % 256``) for the real pixel-decode path.
    """
    from typing import Iterator

    import pandas as pd

    from webgraph_algo_rs_spark.functions.multimodal import MEDIA_SCHEMA
    from webgraph_algo_rs_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "kind", "payload", "width", "height", "duration_ms")}
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if decode_corpus:
                    w, h, c = 5, 3, d % 256
                    row_b = (w * 3 + 3) & ~3
                    px = (bytes([c, c, c] * w) + b"\x00" * (row_b - 3 * w)) * h
                    payload = (
                        b"BM" + (54 + len(px)).to_bytes(4, "little") + b"\x00" * 4
                        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
                        + w.to_bytes(4, "little", signed=True)
                        + h.to_bytes(4, "little", signed=True)
                        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
                        + (0).to_bytes(4, "little") + len(px).to_bytes(4, "little")
                        + b"\x00" * 16 + px
                    )
                    kind, dw, dh, dd = "image", w, h, None
                else:
                    sel = d % 6
                    w, h = 1 + d % 13, 1 + d % 7
                    mis = 1 if d % 5 == 0 else 0
                    kind, dw, dh, dd = "image", w + mis, h, None
                    if sel == 0:  # BMP: probe reads w/h at byte 18/22
                        payload = b"BM" + b"\x00" * 16 + w.to_bytes(
                            4, "little", signed=True
                        ) + h.to_bytes(4, "little", signed=True)
                    elif sel == 1:  # PNG: sig + IHDR length/type/w/h
                        payload = (
                            b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big")
                            + b"IHDR" + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                        )
                    elif sel == 2:  # GIF: logical screen descriptor
                        payload = (
                            b"GIF89a" + w.to_bytes(2, "little")
                            + h.to_bytes(2, "little") + bytes([0, 0, 0])
                        )
                    elif sel == 3:  # JPEG: SOI + SOF0 frame header
                        payload = (
                            b"\xff\xd8\xff\xc0" + (11).to_bytes(2, "big")
                            + bytes([8]) + h.to_bytes(2, "big")
                            + w.to_bytes(2, "big") + bytes([1, 1, 0x11, 0])
                        )
                    elif sel == 4:  # WAV: fmt byte_rate 8000, sized data chunk
                        data_size = 80 * (1 + d % 4)
                        payload = (
                            b"RIFF" + b"\x00" * 4 + b"WAVE"
                            + b"fmt " + (16).to_bytes(4, "little")
                            + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
                            + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
                            + (1).to_bytes(2, "little") + (8).to_bytes(2, "little")
                            + b"data" + data_size.to_bytes(4, "little")
                        )
                        kind, dw, dh = "audio", None, None
                        dd = data_size // 8 + mis
                    else:  # corrupt: probe yields no format
                        payload = b"\x00notamedia" + d.to_bytes(4, "little")
                out["media_id"].append(d)
                out["kind"].append(kind)
                out["payload"].append(payload)
                out["width"].append(dw)
                out["height"].append(dh)
                out["duration_ms"].append(dd)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(out["media_id"], dtype="int64"),
                    "kind": out["kind"],
                    "payload": out["payload"],
                    "width": pd.array(out["width"], dtype="Int32"),
                    "height": pd.array(out["height"], dtype="Int32"),
                    "duration_ms": pd.array(out["duration_ms"], dtype="Int32"),
                }
            )

    return docs.mapInPandas(gen, schema=MEDIA_SCHEMA)


def q_media_probe_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container-header probe + metadata cross-check over the synthetic
    rule-derived corpus — every output column is predicted exactly by
    the DuckDB oracle replaying the synthesis rule."""
    from webgraph_algo_rs_spark.functions.multimodal import media_metadata

    media = _synth_media_payloads(spark, sf_dir, decode_corpus=False)
    return media_metadata(media).select(
        F.col("media_id").alias("doc_id"),
        "kind",
        "detected_format",
        "width",
        "height",
        "duration_ms",
        "metadata_consistent",
    )


def q_media_decode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode through the probe-gated Spark route: constant
    5×3 BMPs whose decoded grid-mean features the oracle predicts from
    the gray value alone (feature·255 rounds back to ``doc_id % 256``)."""
    from webgraph_algo_rs_spark.functions.multimodal import (
        decode_builtin,
        probe_gated_features,
    )

    media = _synth_media_payloads(spark, sf_dir, decode_corpus=True)
    feats, _quarantine = probe_gated_features(media, feat_dim=4, decode=decode_builtin)
    return feats.select(
        F.col("media_id").alias("doc_id"),
        "n_bytes",
        F.col("frames_sampled").cast("long").alias("frames_sampled"),
        F.round(F.element_at("feature", 1).cast("double") * 255.0, 1).alias("gray_f0"),
        F.round(F.element_at("feature", 4).cast("double") * 255.0, 1).alias("gray_f3"),
    )


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import cosine_topk_bruteforce
    from webgraph_algo_rs_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = cosine_topk_bruteforce(emb, queries=emb.filter("vec_id < 10"), k=5)
    return out.select("query_id", "neighbor_id", F.col("rank").cast("long").alias("rank"))


def _ann_dim() -> int:
    """Embedding width of the corpus the ORACLE runs against (the
    driver's correctness gate registers the sf0.01 parquet; override
    with WGA_ORACLE_SF_DIR). Read from the data instead of pinning 64
    (ADVICE r3: a non-64-wide SF would silently give the Spark query
    and the DuckDB oracle different hyperplane families)."""
    import os

    sf_dir = os.environ.get("WGA_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
        batch = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
        return len(batch.column("embedding")[0].as_py())
    except Exception:
        return 64


def _ann_lsh_sql() -> str:
    """DuckDB twin of ``cosine_topk_lsh``: the seeded hyperplanes
    (``similarity._hyperplanes``, seed 42 — driver-side plan literals in
    the Spark query too) are embedded as SQL literals, exactly as the
    MinHash oracle embeds its affine hash family. The hyperplane width
    is read from the oracle corpus itself (``_ann_dim``), matching
    ``q_ann_lsh``'s data-derived dim."""
    from webgraph_algo_rs_spark.functions.similarity import _hyperplanes

    planes = _hyperplanes(_ann_dim(), 8, 4, 42)
    tables = []
    for t in range(4):
        bits = []
        for p in range(8):
            lits = ", ".join(repr(float(x)) for x in planes[t, p])
            bits.append(
                f"(CASE WHEN list_dot_product(v, [{lits}]) >= 0"
                f" THEN {1 << (7 - p)} ELSE 0 END)"
            )
        tables.append(
            f"SELECT vec_id, {t} AS table_id,\n  "
            + "\n  + ".join(bits)
            + " AS bucket FROM vall"
        )
    buckets = "\nUNION ALL\n".join(tables)
    return f"""
WITH vall AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), buckets AS (
{buckets}
), cand AS (
  SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS neighbor_id
  FROM buckets a JOIN buckets b
    ON a.table_id = b.table_id AND a.bucket = b.bucket
  WHERE a.vec_id <> b.vec_id
), vecs AS (
  SELECT vec_id, v FROM vall WHERE list_sum([x * x for x in v]) > 0
), s AS (
  SELECT c.query_id, c.neighbor_id, list_cosine_similarity(q.v, n.v) AS sim
  FROM cand c
  JOIN vecs q ON c.query_id = q.vec_id
  JOIN vecs n ON c.neighbor_id = n.vec_id
), r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
  FROM s
)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= 5
"""


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from webgraph_algo_rs_spark.functions import cosine_topk_lsh
    from webgraph_algo_rs_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    return cosine_topk_lsh(emb, dim=dim, k=5).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF(-flat) ANN (`functions/similarity.py:cosine_topk_ivf`): the
    coarse centroids are the 16 corpus vectors with smallest md5(id) —
    a data-derived rule both engines compute identically, so the oracle
    needs no embedded model state at all."""
    from webgraph_algo_rs_spark.functions import cosine_topk_ivf
    from webgraph_algo_rs_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_ivf(emb, k=5, n_lists=16, n_probe=4).select(
        "query_id", "neighbor_id", F.col("rank").cast("long").alias("rank")
    )


_ANN_IVF_SQL = """
WITH vall AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), vecs AS (
  SELECT vec_id, v, sqrt(list_sum([x * x for x in v])) AS nrm
  FROM vall WHERE list_sum([x * x for x in v]) > 0
), cent AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS list_id,
         v AS cv, nrm AS cnrm
  FROM vecs
  QUALIFY list_id <= 16
), sims AS (
  SELECT vecs.vec_id, cent.list_id,
         list_dot_product(v, cv) / (nrm * cnrm) AS sim
  FROM vecs CROSS JOIN cent
), ranked AS (
  SELECT vec_id, list_id,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, list_id) AS rn
  FROM sims
), assign AS (
  SELECT vec_id, list_id FROM ranked WHERE rn = 1
), probes AS (
  SELECT vec_id AS query_id, list_id FROM ranked WHERE rn <= 4
), cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
  FROM probes p JOIN assign a ON p.list_id = a.list_id
  WHERE a.vec_id <> p.query_id
), s AS (
  SELECT c.query_id, c.neighbor_id,
         list_dot_product(q.v, n.v) / (q.nrm * n.nrm) AS sim
  FROM cand c
  JOIN vecs q ON c.query_id = q.vec_id
  JOIN vecs n ON c.neighbor_id = n.vec_id
), r AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
  FROM s
)
SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS rank FROM r WHERE rn <= 5
"""


def q_nf_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global neighbourhood function (SURVEY §2 O8, reference
    `hyperball_impl.rs:1047-1051,626-629`): N(t) per superstep from the
    same HyperBall run the centralities oracle replays bit-exactly; see
    `_hyperball_nf_sql` for the rounding/truncation contract that makes
    the cross-engine hash exact."""
    from webgraph_algo_rs_spark.operators import neighbourhood_function

    vals = [round(v, 6) for v in neighbourhood_function(_events_edges(spark, sf_dir))]
    rows: list[tuple[int, float]] = []
    prev = None
    for t, v in enumerate(vals):
        if prev is None or v > prev:
            rows.append((t, v))
            prev = v
    return spark.createDataFrame(rows, "t bigint, nf double")


def q_hyperball_discounted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted centrality (SURVEY §2 O11, reference's user-supplied
    discount `hyperball_impl.rs` Σ Δ·f(t)) with f(t)=2^-t — the one
    HyperBall output column the main hyperball_events row doesn't carry
    (1/t would duplicate harmonic). Same bit-exact replay prefix, tail
    sums delta·2^-t."""
    from webgraph_algo_rs_spark.operators import hyperball

    return hyperball(
        _events_edges(spark, sf_dir), discount=lambda t: 0.5 ** t
    ).select("vertex", "discounted")


def q_nf_tree_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighbourhood function over the deterministic 3-ary tree
    (same derivation as q_dfs_tree_events) — the events graph at sf0.01
    saturates in ~3 supersteps, so this row pins the N(t) trajectory on
    a diameter-8 graph where the per-superstep clamp and truncation
    rules actually bite."""
    from webgraph_algo_rs_spark.operators import neighbourhood_function
    from webgraph_algo_rs_spark.sources.tables import load_table

    n = min(load_table(spark, sf_dir, "events").count(), 4095)
    edges = spark.range(1, n).select(
        F.floor((F.col("id") - 1) / 3).cast("long").alias("src_vertex"),
        F.col("id").cast("long").alias("dst_vertex"),
        F.lit(1.0).alias("weight"),
    )
    vals = [round(v, 6) for v in neighbourhood_function(edges)]
    rows: list[tuple[int, float]] = []
    prev = None
    for t, v in enumerate(vals):
        if prev is None or v > prev:
            rows.append((t, v))
            prev = v
    return spark.createDataFrame(rows, "t bigint, nf double")


def q_bfs_multisource_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component multi-source BFS (SURVEY §2 O18, reference
    `visits/mod.rs` multi-flood contract): one tagged flood carrying all
    sources at once — the primitive ExactSumSweep's batched sweeps are
    built on. Sources are every 37th vertex id, a rule the DuckDB
    recursive-CTE oracle derives identically."""
    from webgraph_algo_rs_spark.operators import bfs_distances
    from webgraph_algo_rs_spark.plans.superstep import graph_vertices

    edges = _events_edges(spark, sf_dir)
    sources = graph_vertices(edges).filter(F.col("vertex") % 37 == 0)
    return bfs_distances(edges, sources.select(F.col("vertex").alias("source"))).select(
        "source", "vertex", "distance"
    )


_STREAM_SENTINEL_TS = 1893456000  # 2030-01-01 UTC, past every base window

# DuckDB regeneration of sql_transcripts(300) with the closed-form epoch
# timestamp (1704067200 + cid*300 + turn_idx*7 — transcripts.py:110-112);
# base CTE for both streaming oracles
_STREAM_BASE_SQL = """
WITH conv AS (SELECT i AS cid, 2 + (i * 7919) % 29 AS n FROM range(0, 300) r(i)),
turns AS (SELECT cid, unnest(generate_series(0, n - 1)) AS turn_idx FROM conv),
t AS (
  SELECT cid, turn_idx,
         CASE WHEN turn_idx % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN turn_idx % 2 = 1 AND (cid * 31 + turn_idx * 17) % 10 < 4
              THEN printf('tool_%03d', (cid * 13 + turn_idx * 7) % 64) END AS tool,
         1704067200 + cid * 300 + turn_idx * 7 AS ts_s
  FROM turns
)
"""


def _stream_source_dir(spark: SparkSession) -> str:
    """Write the arithmetic transcript table (`sql_transcripts(300)` —
    the same closed-form source the batch transcript queries use) as the
    file-stream input, one fresh dir per call so gate re-runs never share
    stream checkpoints."""
    import tempfile

    from webgraph_algo_rs_spark.sources.transcripts import sql_transcripts

    tmp = tempfile.mkdtemp(prefix="wga_gate_stream_")
    in_dir = f"{tmp}/in"
    sql_transcripts(spark, 300).write.mode("append").parquet(in_dir)
    return tmp


def q_stream_turn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming surface under the oracle gate: the
    watermarked tumbling-window rollup (`streaming/transcripts_stream.py
    ::windowed_turn_stats`) replayed to completion over the arithmetic
    transcript source. Two-phase run mirrors the stream's real
    append-mode semantics — the base feed first, then a far-future
    sentinel row whose watermark advance flushes every base window
    exactly once. The 48h watermark covers the 25h base span so no base
    row is late w.r.t. intra-run batch ordering. The sentinel's own
    window can never flush (nothing follows it), so the sink holds
    precisely the batch windowed aggregation of the base table — which
    is what the DuckDB oracle computes. The engine-approximate
    `n_convs_approx` column is excluded from the cross-engine compare
    (sketch internals differ per engine); exact columns only."""
    import datetime as dt

    from webgraph_algo_rs_spark.streaming import (
        stream_transcripts,
        windowed_turn_stats,
    )

    tmp = _stream_source_dir(spark)
    in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    q1 = windowed_turn_stats(
        stream_transcripts(spark, in_dir), out_dir, ckpt,
        window="1 hour", watermark="48 hours",
    )
    q1.awaitTermination(300)
    sentinel = spark.createDataFrame(
        [("conv-sentinel", 0, "user", "sentinel", None,
          dt.datetime.fromtimestamp(_STREAM_SENTINEL_TS, dt.timezone.utc))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    sentinel.write.mode("append").parquet(in_dir)
    q2 = windowed_turn_stats(
        stream_transcripts(spark, in_dir), out_dir, ckpt,
        window="1 hour", watermark="48 hours",
    )
    q2.awaitTermination(300)
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("window_start").cast("long") < _STREAM_SENTINEL_TS - 86400)
        .select(
            F.col("window_start").cast("long").alias("window_start_s"),
            "role",
            "n_turns",
            "n_tool_calls",
        )
    )


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (`applyInPandasWithState`
    sessionizer) under the oracle gate: replay the arithmetic transcript
    feed to completion and reduce each conversation's emitted rows to
    its final state (all four stats are monotone across a conversation's
    per-batch emissions, so max/min over emissions == the keyed state at
    stream end regardless of how the file source batched the feed). The
    DuckDB oracle is the batch GROUP BY the final state must equal."""
    from webgraph_algo_rs_spark.streaming import (
        conversation_sessions,
        stream_transcripts,
    )

    tmp = _stream_source_dir(spark)
    in_dir, out_dir, ckpt = f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt"
    q = conversation_sessions(stream_transcripts(spark, in_dir), out_dir, ckpt)
    q.awaitTermination(300)
    return (
        spark.read.parquet(out_dir)
        .groupBy("conv_id")
        .agg(
            F.max("n_turns").alias("n_turns"),
            F.max("n_tool_calls").alias("n_tool_calls"),
            F.min(F.col("first_ts").cast("long")).alias("first_ts_s"),
            F.max(F.col("last_ts").cast("long")).alias("last_ts_s"),
        )
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-vertex graph summary (degrees ⋈ components ⋈
    pagerank ⋈ triangles) of the sf0.001 events interaction graph."""
    from webgraph_algo_rs_spark.operators import (
        connected_components,
        degrees,
        pagerank,
        triangle_count_per_vertex,
    )

    sf_dir = "/root/testdata/sf0.001"
    edges = _events_edges(spark, sf_dir).localCheckpoint(eager=True)
    return (
        degrees(edges)
        .join(connected_components(edges), "vertex")
        .join(pagerank(edges, tol=1e-6, max_iter=100), "vertex")
        .join(triangle_count_per_vertex(edges), "vertex")
        .select(
            "vertex", "out_degree", "in_degree", "out_weight", "in_weight",
            "component", "rank", "n_triangles",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_events": q_edges_events,
        "degrees_events": q_degrees_events,
        "cc_events": q_cc_events,
        "cc_events_dist": q_cc_events_dist,
        "pagerank_events_dist": q_pagerank_events_dist,
        "hyperball_events_dist": q_hyperball_events_dist,
        "cc_events_sf01": q_cc_events_sf01,
        "cc_sizes_events": q_cc_sizes_events,
        "triangles_global_events": q_triangles_global_events,
        "triangles_vertex_events": q_triangles_vertex_events,
        "top_inweight_events": q_top_inweight_events,
        "bfs_events": q_bfs_events,
        "dfs_tree_events": q_dfs_tree_events,
        "pagerank_events": q_pagerank_events,
        "lpa_events": q_lpa_events,
        "edges_cust_supp": q_edges_cust_supp,
        "kahn_layers_cust_supp": q_kahn_layers_cust_supp,
        "hyperball_events": q_hyperball_events,
        "scc_events": q_scc_events,
        "scc_condensation_cust_supp": q_scc_condensation_cust_supp,
        "symmetry_events": q_symmetry_events,
        "eccentricities_events": q_eccentricities_events,
        "radius_diameter_events": q_radius_diameter_events,
        "radius_diameter_fast_events": q_radius_diameter_fast_events,
        "acyclicity_events": q_acyclicity_events,
        "diameter_events": q_diameter_events,
        "radius_events": q_radius_events,
        "diameter_directed_events": q_diameter_directed_events,
        "radius_directed_events": q_radius_directed_events,
        "ecc_forward_events": q_ecc_forward_events,
        "ecc_directed_events": q_ecc_directed_events,
        "radius_diameter_directed_events": q_radius_diameter_directed_events,
        "radius_diameter_directed_fast_events": q_radius_diameter_directed_fast_events,
        "embedding_near_dups": q_embedding_near_dups,
        "transcript_edges": q_transcript_edges,
        "pagerank_transcripts": q_pagerank_transcripts,
        "dedup_exact_docs": q_dedup_exact_docs,
        "token_counts_docs": q_token_counts_docs,
        "quality_docs": q_quality_docs,
        "langid_docs": q_langid_docs,
        "fingerprints_docs": q_fingerprints_docs,
        "minhash_docs": q_minhash_docs,
        "lsh_pairs_docs": q_lsh_pairs_docs,
        "jaccard_pairs_docs": q_jaccard_pairs_docs,
        "simhash_docs": q_simhash_docs,
        "media_probe_docs": q_media_probe_docs,
        "media_decode_docs": q_media_decode_docs,
        "ann_topk": q_ann_topk,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "hyperball_discounted_events": q_hyperball_discounted_events,
        "nf_events": q_nf_events,
        "nf_tree_events": q_nf_tree_events,
        "bfs_multisource_events": q_bfs_multisource_events,
        "stream_turn_stats": q_stream_turn_stats,
        "stream_sessions": q_stream_sessions,
    }


def oracle_sql() -> dict[str, str]:
    # twin of lsh_candidate_pairs' guards: band only the canonical doc of
    # each exact-duplicate class, drop band buckets above the size cap
    lsh_bands = """
, canon AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), sigs AS (
  SELECT h.doc_id,
         {mh} AS m
  FROM hashed h JOIN canon c ON h.doc_id = c.doc_id
), banded0 AS (
  SELECT doc_id, i AS band_idx,
         CAST(m[2*i+1] AS VARCHAR) || '|' || CAST(m[2*i+2] AS VARCHAR) AS band_hash
  FROM sigs, generate_series(0, 3) AS t(i)
), bsz AS (
  SELECT band_idx, band_hash, count(*) AS n
  FROM banded0 GROUP BY band_idx, band_hash
), banded AS (
  SELECT b.doc_id, b.band_idx, b.band_hash
  FROM banded0 b JOIN bsz USING (band_idx, band_hash)
  WHERE bsz.n <= 10000
)
""".format(mh="[" + ", ".join(_mh_sql(i) for i in range(8)) + "]")

    out = {
        "edges_events": _EG + "SELECT src_vertex, dst_vertex, weight FROM eg",
        "pagerank_events": _EG + _pagerank_sql("eg", "verts"),
        "lpa_events": _EG + _lpa_sql("eg", "verts"),
        "transcript_edges": _transcript_graph_sql()
        + "SELECT src_vertex, dst_vertex, weight FROM teg",
        "pagerank_transcripts": _transcript_graph_sql() + _pagerank_sql("teg", "tverts"),
        "degrees_events": _EG + """
SELECT v.v AS vertex,
       CAST(coalesce(o.cnt, 0) AS BIGINT) AS out_degree,
       CAST(coalesce(i.cnt, 0) AS BIGINT) AS in_degree,
       coalesce(o.w, 0.0) AS out_weight,
       coalesce(i.w, 0.0) AS in_weight
FROM verts v
LEFT JOIN (SELECT src_vertex, count(*) cnt, sum(weight) w FROM eg GROUP BY 1) o
  ON v.v = o.src_vertex
LEFT JOIN (SELECT dst_vertex, count(*) cnt, sum(weight) w FROM eg GROUP BY 1) i
  ON v.v = i.dst_vertex
""",
        "cc_events": _EG + """
, cc(v, label) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.d, cc.label FROM cc JOIN sym s ON cc.v = s.s
)
SELECT v AS vertex, min(label) AS component FROM cc GROUP BY v
""",
        # same CC, non-toy scale: the events table is read straight from
        # the sf0.1 parquet (the gate's registered views are sf0.01)
        "cc_events_sf01": _EG.replace(
            "FROM events",
            f"FROM read_parquet('{_sf01_dir()}/events.parquet')",
        )
        + """
, cc(v, label) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.d, cc.label FROM cc JOIN sym s ON cc.v = s.s
)
SELECT v AS vertex, min(label) AS component FROM cc GROUP BY v
""",
        "cc_sizes_events": _EG + """
, cc(v, label) AS (
  SELECT v, v FROM verts
  UNION
  SELECT s.d, cc.label FROM cc JOIN sym s ON cc.v = s.s
), comp AS (
  SELECT v, min(label) AS component FROM cc GROUP BY v
)
SELECT component, CAST(count(*) AS BIGINT) AS size FROM comp GROUP BY 1
""",
        "triangles_global_events": _EG + """
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM und e1
JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
""",
        "triangles_vertex_events": _EG + """
, tri AS (
  SELECT e1.a AS u, e1.b AS v, e2.b AS w
  FROM und e1
  JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
  JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
), corners AS (
  SELECT u AS vertex FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
)
SELECT vt.v AS vertex, CAST(coalesce(c.n, 0) AS BIGINT) AS n_triangles
FROM verts vt
LEFT JOIN (SELECT vertex, count(*) n FROM corners GROUP BY 1) c ON vt.v = c.vertex
""",
        "top_inweight_events": _EG + """
, iw AS (
  SELECT v.v AS vertex, coalesce(i.w, 0.0) AS in_weight
  FROM verts v
  LEFT JOIN (SELECT dst_vertex, sum(weight) w FROM eg GROUP BY 1) i
    ON v.v = i.dst_vertex
)
SELECT vertex, in_weight FROM iw ORDER BY in_weight DESC, vertex LIMIT 10
""",
        "bfs_events": _EG + """
, src AS (SELECT min(v) AS s FROM verts)
, r(v, d) AS (
  SELECT s, 0 FROM src
  UNION
  SELECT e.dst_vertex, r.d + 1 FROM r JOIN eg e ON r.v = e.src_vertex
  WHERE r.d < 300
)
SELECT v AS vertex, CAST(min(d) AS BIGINT) AS distance FROM r GROUP BY v
""",
        # DFS over the derived 3-ary tree (see q_dfs_tree_events):
        # preorder = rank of the zero-padded root path; postorder = rank
        # of the path with a '~' sentinel appended, which sorts every
        # descendant (digit < '~') before its ancestor
        "dfs_tree_events": """
WITH RECURSIVE nn AS (
  SELECT LEAST((SELECT COUNT(*) FROM events), 4095) AS n
),
t(v, path, depth) AS (
  SELECT CAST(0 AS BIGINT), lpad('0', 6, '0'), CAST(0 AS BIGINT)
  UNION ALL
  SELECT 3 * t.v + k.j, t.path || lpad(CAST(3 * t.v + k.j AS VARCHAR), 6, '0'),
         t.depth + 1
  FROM t, (VALUES (1), (2), (3)) AS k(j), nn
  WHERE 3 * t.v + k.j < nn.n
)
SELECT v AS vertex,
       CAST(0 AS BIGINT) AS root,
       CASE WHEN v = 0 THEN NULL ELSE (v - 1) // 3 END AS parent,
       depth,
       CAST(ROW_NUMBER() OVER (ORDER BY path) - 1 AS BIGINT) AS pre,
       CAST(ROW_NUMBER() OVER (ORDER BY path || '~') - 1 AS BIGINT) AS post
FROM t
""",
        "scc_events": _EG + """
, reach(s, d) AS (
  SELECT src_vertex, dst_vertex FROM eg
  UNION
  SELECT r.s, e.dst_vertex FROM reach r JOIN eg e ON r.d = e.src_vertex
), mutual AS (
  SELECT r1.s AS v, r1.d AS w
  FROM reach r1 JOIN reach r2 ON r1.s = r2.d AND r1.d = r2.s
)
SELECT v.v AS vertex,
       CAST(least(v.v, coalesce(m.minw, v.v)) AS BIGINT) AS component
FROM verts v
LEFT JOIN (SELECT v, min(w) AS minw FROM mutual GROUP BY v) m ON v.v = m.v
""",
        "eccentricities_events": _EG + """
, r(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT r.s, e.d, r.d + 1 FROM r JOIN sym e ON r.v = e.s WHERE r.d < (SELECT count(*) FROM verts)
), dist AS (
  SELECT s, v, min(d) AS d FROM r GROUP BY s, v
)
SELECT s AS vertex, CAST(max(d) AS BIGINT) AS ecc FROM dist GROUP BY s
""",
        "radius_diameter_events": _EG + """
, r(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT r.s, e.d, r.d + 1 FROM r JOIN sym e ON r.v = e.s WHERE r.d < (SELECT count(*) FROM verts)
), dist AS (
  SELECT s, v, min(d) AS d FROM r GROUP BY s, v
), ecc AS (
  SELECT s AS vertex, max(d) AS ecc FROM dist GROUP BY s
)
SELECT CAST(min(ecc) AS BIGINT) AS radius,
       CAST(max(ecc) AS BIGINT) AS diameter,
       (SELECT CAST(vertex AS BIGINT) FROM ecc ORDER BY ecc ASC, vertex ASC LIMIT 1) AS radius_vertex,
       (SELECT CAST(vertex AS BIGINT) FROM ecc ORDER BY ecc DESC, vertex ASC LIMIT 1) AS diameter_vertex
FROM ecc
""",
        "radius_diameter_fast_events": _EG + """
, r(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT r.s, e.d, r.d + 1 FROM r JOIN sym e ON r.v = e.s WHERE r.d < (SELECT count(*) FROM verts)
), dist AS (
  SELECT s, v, min(d) AS d FROM r GROUP BY s, v
), ecc AS (
  SELECT s AS vertex, max(d) AS ecc FROM dist GROUP BY s
)
SELECT CAST(min(ecc) AS BIGINT) AS radius,
       CAST(max(ecc) AS BIGINT) AS diameter
FROM ecc
""",
        "acyclicity_events": _EG + """
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
)
SELECT (SELECT count(*) FROM rf WHERE s = v AND d > 0) = 0 AS is_acyclic
""",
        "diameter_events": _EG + """
, r(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT r.s, e.d, r.d + 1 FROM r JOIN sym e ON r.v = e.s WHERE r.d < (SELECT count(*) FROM verts)
), dist AS (
  SELECT s, v, min(d) AS d FROM r GROUP BY s, v
), ecc AS (
  SELECT s AS vertex, max(d) AS ecc FROM dist GROUP BY s
)
SELECT CAST(max(ecc) AS BIGINT) AS diameter FROM ecc
""",
        "radius_events": _EG + """
, r(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT r.s, e.d, r.d + 1 FROM r JOIN sym e ON r.v = e.s WHERE r.d < (SELECT count(*) FROM verts)
), dist AS (
  SELECT s, v, min(d) AS d FROM r GROUP BY s, v
), ecc AS (
  SELECT s AS vertex, max(d) AS ecc FROM dist GROUP BY s
)
SELECT CAST(min(ecc) AS BIGINT) AS radius FROM ecc
""",
        "diameter_directed_events": _EG + """
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
), distf AS (SELECT s, v, min(d) AS d FROM rf GROUP BY s, v),
eccf AS (SELECT s AS vertex, max(d) AS e FROM distf GROUP BY s)
SELECT CAST(max(e) AS BIGINT) AS diameter FROM eccf
""",
        "radius_directed_events": _EG + """
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
), distf AS (SELECT s, v, min(d) AS d FROM rf GROUP BY s, v),
eccf AS (SELECT s AS vertex, max(d) AS e FROM distf GROUP BY s),
scc0 AS (
  SELECT r1.s AS v, min(r1.v) AS minw
  FROM distf r1 JOIN distf r2 ON r1.s = r2.v AND r1.v = r2.s
  GROUP BY r1.s
),
scc AS (
  SELECT vt.v AS vertex, least(vt.v, coalesce(s.minw, vt.v)) AS component
  FROM verts vt LEFT JOIN scc0 s ON vt.v = s.v
),
bigc AS (
  SELECT component FROM scc GROUP BY component
  ORDER BY count(*) DESC, component ASC LIMIT 1
),
radial AS (
  SELECT DISTINCT df.s AS vertex
  FROM distf df JOIN scc ON df.v = scc.vertex
  WHERE scc.component = (SELECT component FROM bigc)
)
SELECT CAST(min(e) AS BIGINT) AS radius FROM eccf JOIN radial USING (vertex)
""",
        "ecc_forward_events": _EG + """
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
), distf AS (SELECT s, v, min(d) AS d FROM rf GROUP BY s, v)
SELECT vt.v AS vertex,
       CAST((SELECT max(d) FROM distf WHERE distf.s = vt.v) AS BIGINT) AS ecc_f
FROM verts vt
""",
        "ecc_directed_events": _EG + """
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
), distf AS (SELECT s, v, min(d) AS d FROM rf GROUP BY s, v)
SELECT vt.v AS vertex,
       CAST((SELECT max(d) FROM distf WHERE distf.s = vt.v) AS BIGINT) AS ecc_f,
       CAST((SELECT max(d) FROM distf WHERE distf.v = vt.v) AS BIGINT) AS ecc_b
FROM verts vt
""",
        "radius_diameter_directed_events": _EG + """
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
), distf AS (SELECT s, v, min(d) AS d FROM rf GROUP BY s, v),
eccf AS (SELECT s AS vertex, max(d) AS e FROM distf GROUP BY s),
scc0 AS (
  SELECT r1.s AS v, min(r1.v) AS minw
  FROM distf r1 JOIN distf r2 ON r1.s = r2.v AND r1.v = r2.s
  GROUP BY r1.s
),
scc AS (
  SELECT vt.v AS vertex, least(vt.v, coalesce(s.minw, vt.v)) AS component
  FROM verts vt LEFT JOIN scc0 s ON vt.v = s.v
),
bigc AS (
  SELECT component FROM scc GROUP BY component
  ORDER BY count(*) DESC, component ASC LIMIT 1
),
radial AS (
  SELECT DISTINCT df.s AS vertex
  FROM distf df JOIN scc ON df.v = scc.vertex
  WHERE scc.component = (SELECT component FROM bigc)
)
SELECT
  (SELECT CAST(min(e) AS BIGINT) FROM eccf JOIN radial USING (vertex)) AS radius,
  (SELECT CAST(max(e) AS BIGINT) FROM eccf) AS diameter,
  (SELECT CAST(vertex AS BIGINT) FROM eccf JOIN radial USING (vertex)
   ORDER BY e ASC, vertex ASC LIMIT 1) AS radius_vertex,
  (SELECT CAST(vertex AS BIGINT) FROM eccf
   ORDER BY e DESC, vertex ASC LIMIT 1) AS diameter_vertex
""",
        "radius_diameter_directed_fast_events": _EG + """
, rf(s, v, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT rf.s, e.dst_vertex, rf.d + 1
  FROM rf JOIN eg e ON rf.v = e.src_vertex WHERE rf.d < (SELECT count(*) FROM verts)
), distf AS (SELECT s, v, min(d) AS d FROM rf GROUP BY s, v),
eccf AS (SELECT s AS vertex, max(d) AS e FROM distf GROUP BY s),
scc0 AS (
  SELECT r1.s AS v, min(r1.v) AS minw
  FROM distf r1 JOIN distf r2 ON r1.s = r2.v AND r1.v = r2.s
  GROUP BY r1.s
),
scc AS (
  SELECT vt.v AS vertex, least(vt.v, coalesce(s.minw, vt.v)) AS component
  FROM verts vt LEFT JOIN scc0 s ON vt.v = s.v
),
bigc AS (
  SELECT component FROM scc GROUP BY component
  ORDER BY count(*) DESC, component ASC LIMIT 1
),
radial AS (
  SELECT DISTINCT df.s AS vertex
  FROM distf df JOIN scc ON df.v = scc.vertex
  WHERE scc.component = (SELECT component FROM bigc)
)
SELECT
  (SELECT CAST(min(e) AS BIGINT) FROM eccf JOIN radial USING (vertex)) AS radius,
  (SELECT CAST(max(e) AS BIGINT) FROM eccf) AS diameter
""",
        "scc_condensation_cust_supp": """
WITH cs AS (
  SELECT CAST(-o.o_custkey - 1 AS BIGINT) AS src, CAST(l.l_suppkey AS BIGINT) AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
)
-- bipartite: every vertex is its own SCC, so component(v) = v and the
-- condensation keeps every distinct arc with n_arcs = 1
SELECT src AS c_src, dst AS c_dst, CAST(1 AS BIGINT) AS n_arcs FROM cs
""",
        "symmetry_events": _EG + """
SELECT
  ((SELECT count(*) FROM (
      SELECT src_vertex AS s, dst_vertex AS d FROM eg
      EXCEPT
      SELECT dst_vertex, src_vertex FROM eg)) = 0) AS directed_is_symmetric,
  ((SELECT count(*) FROM (
      SELECT s, d FROM sym
      EXCEPT
      SELECT d, s FROM sym)) = 0) AS symmetrized_is_symmetric
""",
        "embedding_near_dups": """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
     vn AS (SELECT vec_id, e FROM v WHERE list_sum([x * x for x in e]) > 0)
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM vn a JOIN vn b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.4
""",
        "edges_cust_supp": """
SELECT CAST(-o.o_custkey - 1 AS BIGINT) AS src_vertex,
       CAST(l.l_suppkey AS BIGINT) AS dst_vertex,
       CAST(count(*) AS DOUBLE) AS weight
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY 1, 2
""",
        "kahn_layers_cust_supp": """
WITH cs AS (
  SELECT CAST(-o.o_custkey - 1 AS BIGINT) AS src, CAST(l.l_suppkey AS BIGINT) AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
), verts AS (
  SELECT DISTINCT src AS v FROM cs UNION SELECT DISTINCT dst FROM cs
)
SELECT v AS vertex,
       CAST(CASE WHEN v IN (SELECT dst FROM cs) THEN 1 ELSE 0 END AS BIGINT) AS layer
FROM verts
""",
        "dedup_exact_docs": """
SELECT md5(text) AS text_hash,
       CAST(count(*) AS BIGINT) AS dup_count,
       min(doc_id) AS canonical_id
FROM documents GROUP BY 1
""",
        "token_counts_docs": """
SELECT doc_id,
       CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens,
       CAST(len(text) AS BIGINT) AS n_chars,
       CAST(ceil(len(text) / 4) AS BIGINT) AS n_tokens_bpe_est
FROM documents
""",
        "quality_docs": """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\\s+') AS toks,
         len(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(n_chars AS DOUBLE) / len(toks) AS mean_token_len,
       CAST(n_chars - len(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE) / n_chars AS punct_ratio,
       CAST(len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','for'], x))) AS DOUBLE) / len(toks) AS stopword_ratio,
       CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / n_chars AS alpha_ratio
FROM t
""",
        "langid_docs": """
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id,
    len(list_filter(toks, x -> list_contains(['der','die','und','das','ist','ein','nicht','mit'], x))) AS s_de,
    len(list_filter(toks, x -> list_contains(['the','and','of','to','is','in','that','for'], x))) AS s_en,
    len(list_filter(toks, x -> list_contains(['el','la','de','que','los','en','por','una'], x))) AS s_es,
    len(list_filter(toks, x -> list_contains(['le','la','et','les','des','une','est','dans'], x))) AS s_fr
  FROM t
)
SELECT doc_id,
  CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
       WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
       WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
       WHEN s_es >= s_fr THEN 'es'
       ELSE 'fr' END AS lang_pred,
  CAST(greatest(s_de, s_en, s_es, s_fr) AS BIGINT) AS lang_score
FROM s
""",
        "fingerprints_docs": """
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
""",
        "minhash_docs": _DOCS_SH + f"""
SELECT doc_id, {_mh_sql(0)} AS mh0, {_mh_sql(1)} AS mh1,
       {_mh_sql(2)} AS mh2, {_mh_sql(3)} AS mh3
FROM hashed
""",
        "simhash_docs": """
WITH tk AS (
  SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
  FROM documents
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo
  FROM tk
), g AS (
  SELECT doc_id, count(*) AS cnt,
         """ + ",\n         ".join(
            f"sum(({'hi' if j >= 32 else 'lo'} >> {j % 32}) & 1) AS b{j}"
            for j in range(64)
        ) + """
  FROM h GROUP BY doc_id
)
SELECT doc_id,
       CAST(""" + "\n         + ".join(
            f"CASE WHEN 2 * b{j} > cnt THEN {1 << j if j < 63 else -9223372036854775808} ELSE 0 END"
            for j in range(64)
        ) + """ AS BIGINT) AS simhash
FROM g
""",
        # the synthetic-media corpus is rule-derived from doc_id alone,
        # so the oracle predicts probe/decode outputs without decoding
        "media_probe_docs": """
SELECT doc_id,
       CASE WHEN doc_id % 6 = 4 THEN 'audio' ELSE 'image' END AS kind,
       CASE doc_id % 6 WHEN 0 THEN 'bmp' WHEN 1 THEN 'png' WHEN 2 THEN 'gif'
                       WHEN 3 THEN 'jpeg' WHEN 4 THEN 'wav' END AS detected_format,
       CASE WHEN doc_id % 6 < 4 THEN CAST(1 + doc_id % 13 AS INT) END AS width,
       CASE WHEN doc_id % 6 < 4 THEN CAST(1 + doc_id % 7 AS INT) END AS height,
       CASE WHEN doc_id % 6 = 4 THEN CAST(10 * (1 + doc_id % 4) AS INT) END AS duration_ms,
       (doc_id % 6 < 5 AND doc_id % 5 <> 0) AS metadata_consistent
FROM documents
""",
        # constant 5x3 24-bit BMP: 54-byte header + 3 padded 16-byte rows;
        # grid-mean of a constant image recovers the gray value exactly
        "media_decode_docs": """
SELECT doc_id,
       CAST(102 AS BIGINT) AS n_bytes,
       CAST(1 AS BIGINT) AS frames_sampled,
       ROUND(CAST(doc_id % 256 AS DOUBLE), 1) AS gray_f0,
       ROUND(CAST(doc_id % 256 AS DOUBLE), 1) AS gray_f3
FROM documents
""",
        "lsh_pairs_docs": _DOCS_SH + lsh_bands + """
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
WHERE a.doc_id < b.doc_id
""",
        "jaccard_pairs_docs": _DOCS_SH + lsh_bands + """
, pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
  WHERE a.doc_id < b.doc_id
), sets AS (
  SELECT doc_id, list_distinct(sh) AS sh FROM shingled
)
SELECT p.doc_a, p.doc_b,
       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
         / len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
FROM pairs p
JOIN sets sa ON p.doc_a = sa.doc_id
JOIN sets sb ON p.doc_b = sb.doc_id
""",
        "ann_topk": """
WITH q AS (
  SELECT vec_id AS qid, embedding::DOUBLE[] AS qv FROM embeddings
  WHERE vec_id < 10 AND list_sum([x * x for x in embedding::DOUBLE[]]) > 0
), c AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS cv FROM embeddings
  WHERE list_sum([x * x for x in embedding::DOUBLE[]]) > 0
), s AS (
  SELECT qid, nid, list_cosine_similarity(qv, cv) AS sim
  FROM q, c WHERE qid <> nid
), r AS (
  SELECT qid, nid, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rn
  FROM s
)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS BIGINT) AS rank
FROM r WHERE rn <= 5
""",
        "ann_lsh": _ann_lsh_sql(),
        "ann_ivf": _ANN_IVF_SQL,
        "hyperball_events": _EG + _hyperball_sql(),
        "hyperball_discounted_events": _EG + _hyperball_prefix_sql() + """
, deltas AS (
  SELECT vertex, t, est,
         greatest(est - lag(est) OVER (PARTITION BY vertex ORDER BY t), 0.0) AS delta
  FROM est3
)
SELECT CAST(vertex AS BIGINT) AS vertex,
       coalesce(sum(delta * power(0.5, t)) FILTER (t > 0), 0.0) AS discounted
FROM deltas GROUP BY vertex
""",
        "nf_events": _EG + _hyperball_nf_sql(),
        "nf_tree_events": """
WITH RECURSIVE nn AS (SELECT LEAST((SELECT count(*) FROM events), 4095) AS n),
eg AS (
  SELECT CAST((i - 1) // 3 AS BIGINT) AS src_vertex, CAST(i AS BIGINT) AS dst_vertex
  FROM range(1, 4095) r(i) WHERE i < (SELECT n FROM nn)
), verts AS (
  SELECT CAST(i AS BIGINT) AS v FROM range(0, 4095) r(i) WHERE i < (SELECT n FROM nn)
)""" + _hyperball_nf_sql(),
        "bfs_multisource_events": _EG + """
, srcs AS (SELECT v FROM verts WHERE v % 37 = 0)
, r(source, v, d) AS (
  SELECT v, v, 0 FROM srcs
  UNION
  SELECT r.source, e.dst_vertex, r.d + 1
  FROM r JOIN eg e ON r.v = e.src_vertex
  WHERE r.d < 300
)
SELECT source, v AS vertex, CAST(min(d) AS BIGINT) AS distance
FROM r GROUP BY 1, 2
""",
        # the stream's append-mode sink, flushed to completion by the
        # sentinel row, must equal the plain batch windowed aggregation
        # of the base feed (the sentinel's own window can never flush)
        "stream_turn_stats": _STREAM_BASE_SQL + """
SELECT CAST((ts_s // 3600) * 3600 AS BIGINT) AS window_start_s, role,
       count(*) AS n_turns, count(tool) AS n_tool_calls
FROM t GROUP BY 1, 2
""",
        # the sessionizer's final keyed state per conversation must
        # equal the batch GROUP BY over the same feed
        "stream_sessions": _STREAM_BASE_SQL + """
SELECT printf('conv-%09d', cid) AS conv_id,
       count(*) AS n_turns, count(tool) AS n_tool_calls,
       CAST(min(ts_s) AS BIGINT) AS first_ts_s,
       CAST(max(ts_s) AS BIGINT) AS last_ts_s
FROM t GROUP BY 1
""",
    }
    # the *_dist queries pin local_mode=False on the Spark side only —
    # identical semantics, identical oracle
    out["cc_events_dist"] = out["cc_events"]
    out["pagerank_events_dist"] = out["pagerank_events"]
    out["hyperball_events_dist"] = out["hyperball_events"]
    return out
