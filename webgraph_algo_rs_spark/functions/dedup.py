"""Document deduplication for large-scale training-data pipelines.

All hashing is engine-portable (``md5`` hex strings), so every stage has
an exact ANSI-SQL oracle. Everything stays JVM-side (built-in
``pyspark.sql.functions`` over arrays) except SimHash, whose bit-fold is
a vectorized pandas UDF.

Scale notes:
* exact dedup — one hash ``groupBy``; map-side partial agg makes the hot
  hash (empty doc, boilerplate) a non-issue;
* MinHash+LSH — per-doc signature is an array fold (no shuffle), banding
  explodes to ``n_bands`` rows/doc, the candidate join is a self-join on
  the band bucket: only bucket-colliding docs ever meet, which is the
  whole point vs the O(n²) pair join;
* the n-gram Jaccard verifier runs only on LSH candidates.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# word n-gram shingles as an array column, lowercased, whitespace-split
def _shingles(text_col, n: int = 3):
    toks = F.split(F.lower(F.trim(text_col)), r"\s+")
    k = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), k - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: ``(text_hash, dup_count, canonical_id)``.

    ``canonical_id`` = min id in the duplicate class (keep-first policy).
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias("canonical_id"),
        )
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: for hash *i*, min over shingles of
    ``md5(i || shingle)`` (lexicographic min of hex = a valid min-hash;
    salted md5 = the independent hash family). Output
    ``(doc_id, sig:array<string>)``; no shuffle — pure per-row arrays.
    """
    sh = _shingles(F.col(text_col), shingle_n)

    def salted(i: int):
        # NB: a two-arg lambda would make F.transform pass the element
        # *index* as the second arg — bind the salt via a closure instead.
        return lambda s: F.md5(F.concat(F.lit(f"h{i}:"), s))

    sig = F.array(
        *[F.array_min(F.transform(sh, salted(i))) for i in range(n_hashes)]
    )
    return docs.select(F.col(id_col).alias("doc_id"), sig.alias("sig"))


def lsh_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup candidates ``(doc_a, doc_b)`` (a < b), distinct.

    Signature split into ``bands`` bands of ``n_hashes/bands`` rows; docs
    sharing any full band land in the same bucket. The join key is
    ``(band_idx, band_hash)`` so the self-join only touches genuinely
    colliding buckets.
    """
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, text_col, id_col, n_hashes, shingle_n)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        "|", *[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    a = banded.select(F.col("band_idx"), F.col("band_hash"), F.col("doc_id").alias("doc_a"))
    b = banded.select(F.col("band_idx"), F.col("band_hash"), F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band_idx", "band_hash"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs:
    ``(doc_a, doc_b, jaccard)``. ``pairs`` defaults to LSH candidates —
    never the O(n²) cross join.
    """
    if pairs is None:
        pairs = lsh_candidate_pairs(docs, text_col, id_col, shingle_n=shingle_n)
    sets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(_shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    j = (
        pairs.join(sets.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sets.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        j.select(
            "doc_a",
            "doc_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash64(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash over token md5s: ``(doc_id, simhash:bigint)``.

    The per-token 64 bit-votes fold is numpy inside ``mapInPandas``
    (Arrow batches — never per-row Python).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.int64)
            for row_i, tok_list in enumerate(pdf["toks"]):
                if len(tok_list) == 0:
                    continue
                hs = np.frombuffer(
                    b"".join(
                        hashlib.md5(t.encode()).digest()[:8] for t in tok_list
                    ),
                    dtype=np.uint64,
                )
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
                    np.int32
                )
                votes = bits.sum(axis=0) * 2 - len(hs)  # +1/-1 votes per bit
                sh = np.uint64(0)
                for bit_idx in np.nonzero(votes > 0)[0]:
                    sh |= np.uint64(1) << np.uint64(bit_idx)
                out[row_i] = sh.astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    return toks.mapInPandas(fold, schema="doc_id bigint, simhash bigint")
