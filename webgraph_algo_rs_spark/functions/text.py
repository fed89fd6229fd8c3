"""Text analysis for training-data curation — token counting, quality
scoring, language ID, document fingerprinting. All built-in-function
column expressions (whole-stage codegen; zero Python in the hot path),
each with an exact ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "for"],
    "es": ["el", "la", "de", "que", "los", "en", "por", "una"],
    "fr": ["le", "la", "et", "les", "des", "une", "est", "dans"],
    "de": ["der", "die", "und", "das", "ist", "ein", "nicht", "mit"],
}


def _tokens(text_col):
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (len/4 heuristic used by LLM
    pipelines for budget estimates): ``(doc_id, n_tokens, n_chars, n_tokens_bpe_est)``."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(_tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.ceil(F.length(text_col) / 4).cast("long").alias("n_tokens_bpe_est"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: ``(doc_id, n_tokens, mean_token_len,
    punct_ratio, stopword_ratio, alpha_ratio)`` — standard C4/Gopher-rule
    style signals."""
    toks = _tokens(F.col(text_col))
    n_tok = F.size(toks)
    text = F.col(text_col)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    n_alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    en_stop = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    # try_divide: NULL (not an ANSI error) for degenerate empty docs
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_tok.cast("long").alias("n_tokens"),
        F.try_divide(n_chars.cast("double"), n_tok).alias("mean_token_len"),
        F.try_divide(n_punct.cast("double"), n_chars).alias("punct_ratio"),
        F.try_divide(n_stop.cast("double"), n_tok).alias("stopword_ratio"),
        F.try_divide(n_alpha.cast("double"), n_chars).alias("alpha_ratio"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: ``(doc_id, lang_pred, lang_score)``.

    Score per language = matched stopword count; argmax with
    deterministic tie-break (language code ascending); ``und`` when no
    stopword matches. A real pipeline swaps in fastText — the Spark-side
    shape (pure column expressions, argmax via ``greatest``/``max_by``
    over a small struct array) is the part that matters at 100 TB.
    """
    toks = _tokens(F.col(text_col))

    def matcher(sw: list[str]):
        # closure, not a default arg: a 2-arg lambda would receive the
        # element index from F.filter instead of the stopword list
        arr = F.array(*[F.lit(s) for s in sw])
        return lambda t: F.array_contains(arr, t)

    scores = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, matcher(sw))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(STOPWORDS.items())
        ]
    )
    # max score, then min language code among the tied maxima
    max_score = F.array_max(F.transform(scores, lambda s: s["score"]))
    best_lang = F.array_min(
        F.transform(F.filter(scores, lambda s: s["score"] == max_score), lambda s: s["lang"])
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(max_score > 0, best_lang).otherwise(F.lit("und")).alias("lang_pred"),
        max_score.cast("long").alias("lang_score"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-content fingerprint for boilerplate clustering:
    ``(doc_id, fingerprint)`` = md5 of lowercase, whitespace-collapsed text."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.select(
        F.col(id_col).alias("doc_id"), F.md5(norm).alias("fingerprint")
    )
