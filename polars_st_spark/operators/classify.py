"""Hashed-feature linear text classifier — the fastText / DCLM-style
quality-filter shape, pure Spark SQL.

``score(doc) = intercept + Σ_feature w[h(feature) mod B]`` where features
are lowercased whitespace tokens, optionally plus word-bigram shingles
(the fastText ``wordNgrams=2`` setting). Filtering pretraining corpora
with such a classifier is the published DCLM / CCNet recipe; the weights
come from any externally-trained linear model (fastText, logistic
regression on hashed bags) and are applied here at corpus scale.

Scale design (100 TB):

- Per-row map-only work — no shuffle, no join, no Python workers; the
  whole score is one Spark SQL expression (whole-stage codegen except the
  higher-order aggregate, which is still JVM-side).
- The weight vector rides the plan as ONE staged literal array, bound to
  a lambda variable (`filters._bind`) so Spark does NOT re-materialize
  the array per token (the lambda re-evaluation trap —
  operators/dedup.py `_shingle_table`).
- Feature hashing is the md5-prefix hash (`textops._h`) — engine-portable,
  so scores replay exactly in any SQL engine with ``md5`` (the driver's
  DuckDB oracle does).
- Integer milli-unit weights (:func:`linear_score_milli`) keep the token
  sum in exact BIGINT arithmetic — bit-identical across engines and
  summation orders; the single final division by 1000.0 is IEEE-exact on
  identical operands. :func:`linear_score` accepts float weights for
  interop with real trained models (cross-engine float sums then depend
  on summation order — fine in production, not hash-comparable).

The reference engine (Oreilles/polars-st) has no classifier surface; this
module belongs to the training-data pipeline extensions requested by the
brief (quality scoring family).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from polars_st_spark.functions.factory import col_or_lit
from polars_st_spark.operators.filters import _bind
from polars_st_spark.operators.textops import _h, shingles_from_tokens, tokens

__all__ = [
    "token_buckets",
    "linear_score",
    "linear_score_milli",
    "classify",
]


def _features(text, bigrams: bool) -> Column:
    """Token array, optionally concatenated with word-bigram shingles.
    The token array is bound once (`_bind`) so the bigram lambda slices a
    NamedLambdaVariable instead of re-running the tokenizer per element."""
    toks = tokens(text)
    if not bigrams:
        return toks
    return _bind(toks, lambda t: F.concat(t, shingles_from_tokens(t, 2)))


def token_buckets(text, n_buckets: int = 1024, salt: int = 0,
                  bigrams: bool = False) -> Column:
    """``array<int>`` feature-hash bucket per token (and per bigram when
    ``bigrams``): ``int(md5(salt ':' feature)[:8], 16) mod n_buckets``."""
    feats = _features(text, bigrams)
    return F.transform(
        feats, lambda s: F.pmod(_h(salt, s), F.lit(n_buckets)).cast("int")
    )


def _bucket_sum(buckets: Column, w_arr: Column, zero: Column) -> Column:
    """Σ weights[bucket+1] over the bucket array, weights staged once."""
    return _bind(
        w_arr,
        lambda w: F.aggregate(
            buckets, zero, lambda acc, b: acc + F.element_at(w, b + 1)
        ),
    )


def linear_score(text, weights: Sequence[float], intercept: float = 0.0,
                 salt: int = 0, bigrams: bool = False) -> Column:
    """Double score of a hashed-feature linear model; ``n_buckets`` is
    ``len(weights)``. Thresholding this score is equivalent to
    thresholding the sigmoid probability (monotone), so no transcendental
    ever enters the plan."""
    w_arr = F.array(*[F.lit(float(w)) for w in weights])
    buckets = token_buckets(text, len(weights), salt, bigrams)
    return _bucket_sum(buckets, w_arr, F.lit(float(intercept)))


def linear_score_milli(text, milli_weights: Sequence[int],
                       milli_intercept: int = 0, salt: int = 0,
                       bigrams: bool = False) -> Column:
    """Exact-arithmetic variant: integer milli-unit weights summed as
    BIGINT, one final /1000.0 — cross-engine bit-identical (the gate
    oracle replays it in DuckDB)."""
    w_arr = F.array(*[F.lit(int(w)).cast("long") for w in milli_weights])
    buckets = token_buckets(text, len(milli_weights), salt, bigrams)
    s = _bucket_sum(buckets, w_arr, F.lit(int(milli_intercept)).cast("long"))
    return s / F.lit(1000.0)


def classify(df: DataFrame, text_col: str, weights: Sequence[float],
             intercept: float = 0.0, threshold: float = 0.0,
             salt: int = 0, bigrams: bool = False,
             score_name: str = "q_score", label_name: str = "q_keep") -> DataFrame:
    """Attach ``score_name`` (double) and ``label_name`` (score >
    threshold) columns — the corpus-filter step is then a plain
    ``.where(label_name)``, fully pushdown-friendly."""
    score = linear_score(col_or_lit(text_col), weights, intercept, salt, bigrams)
    return df.withColumn(score_name, score).withColumn(
        label_name, F.col(score_name) > F.lit(float(threshold))
    )
