"""Approximate-nearest-neighbor search over an embedding column.

* ``cosine_topk_bruteforce`` — exact baseline: query×corpus join with the
  dot product as a JVM-side ``aggregate``/``zip_with`` fold (whole-stage
  codegen, no Python). The corpus side of the join is broadcast when it
  fits; queries stream through.
* ``cosine_topk_lsh`` — the scale path: random-hyperplane LSH (seeded,
  deterministic) buckets vectors by sign pattern; candidates meet only
  inside buckets (multi-probe via several independent tables), then the
  exact kernel re-ranks. Hyperplanes are generated once on the driver
  and folded into the plan as literals — no SciPy/model state on
  executors.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _norm(vec_col):
    return F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame | None = None,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded):
    ``(query_id, neighbor_id, rank, cosine)``.

    Deterministic ordering: ``(cosine desc, neighbor_id asc)``. All math
    in float64 regardless of the stored element type.
    """
    if queries is None:
        queries = embeddings
    # zero-norm guard: 0/0 cosine is NaN, and Spark orders NaN *above*
    # every number, so an all-zero vector would outrank real neighbors
    corpus = (
        embeddings.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cvec"),
        )
        .withColumn("cnorm", _norm(F.col("cvec")))
        .filter(F.col("cnorm") > 0)
    )
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
        )
        .withColumn("qnorm", _norm(F.col("qvec")))
        .filter(F.col("qnorm") > 0)
    )
    # the crossJoin stage does |q|·|corpus| dot products in whatever
    # partitioning the QUERY scan happens to have — a single small
    # parquet file (or an AQE-coalesced upstream) serializes the whole
    # O(n²) CPU on one task. The explicit round-robin exchange moves
    # only the query vectors and pins the stage at full width.
    q = q.repartition(
        int(queries.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    )
    scored = (
        q.crossJoin(F.broadcast(corpus))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    use_lsh: bool | None = None,
    dim: int | None = None,
    lsh_auto_threshold: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs ``(id_a, id_b, cosine)``
    with ``id_a < id_b`` and ``cosine >= threshold``.

    Exact path: broadcast self-join + JVM-side dot product — O(n²)
    comparisons, only sane while one side broadcasts. ``use_lsh=True``
    restricts the join to LSH bucket collisions first (candidates only,
    recall < 1 by design, re-ranked exactly). Default (``None``) picks
    automatically: corpora above ``lsh_auto_threshold`` rows take the
    LSH path, so callers can't accidentally run the quadratic join at
    100 TB scale. Zero-norm vectors are excluded (cosine undefined; a
    NaN would otherwise pass every ``>=`` filter under Spark's
    NaN-is-greatest ordering).
    """
    if use_lsh is None:
        # LocalLimit short-circuits the scan: the auto decision costs
        # O(threshold) rows read, not a full count() over the corpus
        use_lsh = (
            embeddings.select(id_col).limit(lsh_auto_threshold + 1).count()
            > lsh_auto_threshold
        )
    if use_lsh and dim is None:
        probe = (
            embeddings.filter(F.col(vec_col).isNotNull())
            .select(F.size(vec_col).alias("d"))
            .filter(F.col("d") > 0)
            .first()
        )
        if probe is None:
            # empty / all-NULL corpus: nothing to bucket — the exact
            # path returns the same (empty) result without needing dim
            use_lsh = False
        else:
            dim = int(probe["d"])
    vecs = (
        embeddings.select(
            F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("n", _norm(F.col("v")))
        .filter(F.col("n") > 0)
    )
    if use_lsh:
        buckets = lsh_buckets(embeddings, dim, id_col=id_col, vec_col=vec_col)
        a = buckets.select("table_id", "bucket", F.col("vec_id").alias("id_a"))
        b = buckets.select("table_id", "bucket", F.col("vec_id").alias("id_b"))
        pairs = (
            a.join(b, ["table_id", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        j = (
            pairs.join(
                vecs.select(F.col("vid").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")),
                "id_a",
            )
            .join(
                vecs.select(F.col("vid").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")),
                "id_b",
            )
        )
    else:
        left = vecs.select(
            F.col("vid").alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
        ).repartition(
            # the nested-loop stage's CPU is O(n²) dot products but its
            # input is one small scan — pin the stage at full width so a
            # single-file corpus doesn't serialize it (see
            # cosine_topk_bruteforce)
            int(embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions"))
        )
        right = vecs.select(
            F.col("vid").alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
        )
        j = left.join(F.broadcast(right), F.col("id_a") < F.col("id_b"))
    return j.select(
        "id_a",
        "id_b",
        (_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def _hyperplanes(dim: int, n_planes: int, n_tables: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def lsh_buckets(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-pattern bucket per (vector, table): ``(vec_id, table_id, bucket)``.

    The sign bits fold into an integer bucket with pure column
    expressions — hyperplane weights become plan literals.
    """
    planes = _hyperplanes(dim, n_planes, n_tables, seed)
    vec = _as_double(F.col(vec_col))
    rows = []
    for t in range(n_tables):
        bucket = F.lit(0)
        for p in range(n_planes):
            w = planes[t, p]
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in w]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            bucket = bucket * 2 + F.when(proj >= 0, 1).otherwise(0)
        rows.append(
            embeddings.select(
                F.col(id_col).alias("vec_id"),
                F.lit(t).alias("table_id"),
                bucket.alias("bucket"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cosine_topk_lsh(
    embeddings: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k via LSH bucketing + exact re-rank of candidates:
    ``(query_id, neighbor_id, rank, cosine)``. Recall < 1 by design;
    tests check recall ≥ threshold vs the brute-force baseline.
    """
    buckets = lsh_buckets(embeddings, dim, n_planes, n_tables, seed, id_col, vec_col)
    a = buckets.select("table_id", "bucket", F.col("vec_id").alias("query_id"))
    b = buckets.select("table_id", "bucket", F.col("vec_id").alias("neighbor_id"))
    cand = (
        a.join(b, ["table_id", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vecs = (
        embeddings.select(
            F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("n", _norm(F.col("v")))
        .filter(F.col("n") > 0)
    )
    scored = (
        cand.join(vecs.withColumnRenamed("vid", "query_id").withColumnRenamed("v", "qv").withColumnRenamed("n", "qn"), "query_id")
        .join(vecs.withColumnRenamed("vid", "neighbor_id").withColumnRenamed("v", "cv").withColumnRenamed("n", "cn"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def ivf_centroids(
    embeddings: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse-quantizer centroids for IVF: the ``n_lists``
    corpus vectors with the smallest ``md5(id)`` — a seeded-sample
    stand-in for k-means that both engines (Spark and the DuckDB oracle)
    can compute from the data with the *same rule*, no fitted model
    state. Returns ``(list_id, cvec, cnorm)``, ``list_id`` dense from 1
    in md5 order. Zero-norm vectors are never centroids.

    The global top-``n_lists`` is ``orderBy().limit()`` — Catalyst's
    ``TakeOrderedAndProject`` (per-partition top-N + driver merge), not
    a single-partition sort; only the selected ``n_lists`` rows ever see
    one partition (for the dense ``list_id`` numbering)."""
    sel = (
        embeddings.select(
            F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("cvec")
        )
        .withColumn("cnorm", _norm(F.col("cvec")))
        .filter(F.col("cnorm") > 0)
        .withColumn("h", F.md5(F.col("vid").cast("string")))
        .orderBy("h", "vid")
        .limit(n_lists)
    )
    w = Window.orderBy("h", "vid")
    return (
        sel.withColumn("list_id", F.row_number().over(w))
        .select("list_id", "cvec", "cnorm")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectorized: bool = True,
) -> DataFrame:
    """ANN top-k via an IVF(-flat) index: assign every vector to its
    nearest coarse centroid's inverted list, probe each query's
    ``n_probe`` nearest lists, re-rank the candidates exactly. Returns
    ``(query_id, neighbor_id, rank)``; recall < 1 by design (tested
    against the brute-force baseline).

    Scale shape: the centroid table is tiny (``n_lists`` × dim doubles)
    and broadcast, so assignment is a broadcast nested-loop whose
    ``n × n_lists`` similarity rows collapse to one row per vector via
    ``max_by`` — a partial (map-side) aggregate, no wide shuffle. The
    candidate join is an equi-join on ``list_id``, and each query
    compares against ~``n_probe/n_lists`` of the corpus instead of all
    of it. Ties break deterministically: centroid argmax by smallest
    ``list_id``, final ranking by ``(cosine desc, neighbor_id)``.

    ``vectorized=True`` (default) re-ranks per inverted list with a
    cogrouped Arrow kernel: queries probing a list and the list's
    members meet in ONE task, the candidate cosines are a dense BLAS
    matmul, and only each query's per-list top-k (``n_probe·k`` rows
    per query, not ``|list|``) leaves the task for the global merge.
    The row-expression path (``vectorized=False``) computes the same
    candidates one pair at a time through interpreted ``zip_with``/
    ``aggregate`` folds — measured ~5 µs/pair, which at 10⁶ candidate
    pairs already dominates the query (the r4 bench: 7.5 s → the
    kernel's sub-second re-rank). Per-task memory for the kernel is
    ``(|list| + probes_into_list) · dim · 8`` bytes — with the usual
    ``n_lists ≈ √n`` sizing that is √-scale in the corpus, and the
    knob that bounds it is ``n_lists`` itself.
    """
    cent = F.broadcast(ivf_centroids(embeddings, n_lists, id_col, vec_col))
    vecs = (
        embeddings.select(
            F.col(id_col).alias("vid"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("n", _norm(F.col("v")))
        .filter(F.col("n") > 0)
    )
    sims = vecs.crossJoin(cent).select(
        "vid",
        "list_id",
        (_dot(F.col("v"), F.col("cvec")) / (F.col("n") * F.col("cnorm"))).alias("sim"),
    )
    # nearest list per vector: max_by over a (sim, -list_id) struct keeps
    # the aggregation partial — ties take the smallest list_id
    assign = sims.groupBy("vid").agg(
        F.max_by(
            "list_id", F.struct(F.col("sim"), (-F.col("list_id")).alias("t"))
        ).alias("list_id")
    )
    pw = Window.partitionBy("vid").orderBy(F.desc("sim"), F.asc("list_id"))
    probes = (
        sims.withColumn("pr", F.row_number().over(pw))
        .filter(F.col("pr") <= n_probe)
        .select(F.col("vid").alias("query_id"), "list_id")
    )
    if vectorized:
        scored = _ivf_rerank_kernel(vecs, assign, probes, k, embeddings.schema[id_col].dataType.simpleString())
    else:
        # a (query, neighbor) pair meets in exactly one list (a member
        # belongs to one list), so the candidate set is duplicate-free
        # by construction — no distinct needed
        cand = (
            probes.join(assign.select(F.col("vid").alias("neighbor_id"), "list_id"), "list_id")
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
        )
        scored = (
            cand.join(
                vecs.select(F.col("vid").alias("query_id"), F.col("v").alias("qv"), F.col("n").alias("qn")),
                "query_id",
            )
            .join(
                vecs.select(F.col("vid").alias("neighbor_id"), F.col("v").alias("cv"), F.col("n").alias("cn")),
                "neighbor_id",
            )
            .select(
                "query_id",
                "neighbor_id",
                (_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("cosine"),
            )
        )
    # global merge: per-list top-k suffices (each pair exists in one
    # list), so this window sees at most n_probe·k rows per query
    # on the kernel path
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _ivf_rerank_kernel(
    vecs: DataFrame, assign: DataFrame, probes: DataFrame, k: int, id_type: str
) -> DataFrame:
    """Per-list exact re-rank as a cogrouped Arrow kernel.

    Each inverted list is one cogroup: the queries probing it (left)
    and its member vectors (right). Inside the task the cosine matrix
    is one float64 BLAS matmul over unit-normalized rows; members are
    pre-sorted by id so a *stable* argsort on ``-cosine`` yields the
    engine-wide tie order (cosine desc, neighbor_id asc) without a
    per-row lexsort. Self-matches are masked to ``-inf``. Only the
    per-(query, list) top-k rows leave the task.
    """
    import pandas as pd

    q_side = probes.join(
        vecs.select(F.col("vid").alias("query_id"), "v"), "query_id"
    ).select("list_id", "query_id", "v")
    m_side = assign.join(vecs.select("vid", "v"), "vid").select(
        "list_id", F.col("vid").alias("neighbor_id"), "v"
    )
    out_schema = (
        f"query_id {id_type}, neighbor_id {id_type}, cosine double"
    )

    def rerank(qpdf: pd.DataFrame, mpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or mpdf.empty:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            )
        mpdf = mpdf.sort_values("neighbor_id", kind="stable")
        mids = mpdf["neighbor_id"].to_numpy()
        M = np.stack(mpdf["v"].to_numpy()).astype(np.float64, copy=False)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        qids = qpdf["query_id"].to_numpy()
        Q = np.stack(qpdf["v"].to_numpy()).astype(np.float64, copy=False)
        Q /= np.linalg.norm(Q, axis=1, keepdims=True)
        S = Q @ M.T
        # mask self-matches (a query probing its own list sees itself)
        pos = {m: i for i, m in enumerate(mids)}
        for qi, q in enumerate(qids):
            mi = pos.get(q)
            if mi is not None:
                S[qi, mi] = -np.inf
        kk = min(k, S.shape[1])
        # stable argsort on -cosine + id-sorted members == tie order
        # (cosine desc, neighbor_id asc); argpartition first bounds the
        # O(m log m) sort to the top slice when lists are wide
        if S.shape[1] > 4 * kk:
            part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            sub = np.take_along_axis(S, part, axis=1)
            # argpartition picks an ARBITRARY subset of members tied at
            # the k-th cosine, but the engine tie order wants the
            # smallest member ids. Rows where the tie straddles the
            # boundary (more row entries equal the boundary value than
            # were selected) fall back to the stable full sort — only
            # exact-duplicate embeddings hit this
            b = sub.min(axis=1)
            amb = (S == b[:, None]).sum(axis=1) > (sub == b[:, None]).sum(axis=1)
            if amb.any():
                part[amb] = np.argsort(-S[amb], axis=1, kind="stable")[:, :kk]
                sub = np.take_along_axis(S, part, axis=1)
            # re-sort the k slice: order by (-cosine, member position)
            ord_in = np.lexsort((part, -sub), axis=1)
            top = np.take_along_axis(part, ord_in, axis=1)
        else:
            top = np.argsort(-S, axis=1, kind="stable")[:, :kk]
        cos = np.take_along_axis(S, top, axis=1)
        keep = np.isfinite(cos).ravel()
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kk)[keep],
                "neighbor_id": mids[top.ravel()][keep],
                "cosine": cos.ravel()[keep],
            }
        )

    return (
        q_side.groupBy("list_id")
        .cogroup(m_side.groupBy("list_id"))
        .applyInPandas(rerank, out_schema)
    )
