"""Explicit skew handling (north rule: mega-documents, hot media_refs).

Three devices, complementing the session-level AQE skew-join:

- ``salted_equi_join``  — replicate the dimension side across N salt
  buckets so one hot key's probe rows spread over N tasks instead of one
  (the classic hot-media_ref join fix when the dim is too big to
  broadcast).
- ``salted_agg``        — two-phase aggregation: partial per (key, salt),
  final per key.  Bounds any single task's group size by ~1/N.
- mega-doc spreading    — implemented in span reassembly
  (``operators/pages.span_sequence_skew_df``: offset-quantile chunked
  two-phase windows for docs past ``cfg.mega_doc_span_threshold``,
  bit-identical to the single-window plan; SURVEY.md §4 P6).

Salt is derived from ``xxhash64`` of a high-cardinality column (or the
row's natural tiebreaker), never from ``rand()`` — deterministic runs,
reproducible tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt_of(col: Column, n_salts: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(n_salts)).cast("int")


def salted_equi_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_from: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` (big, possibly hot-keyed) to ``right`` (dimension) on
    ``key``, spreading each key across ``n_salts`` partitions.

    ``salt_from``: a left-side column with high cardinality (e.g. doc_id)
    that determines the bucket deterministically.

    Only inner/left joins are valid: the right side is replicated across
    ``n_salts`` salt values, so right/full outer joins would emit
    ``n_salts`` copies of every unmatched right row, and semi/anti joins
    lose their set semantics entirely.
    """
    allowed = {"inner", "left", "leftouter", "left_outer"}
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in allowed
    }:
        raise ValueError(
            f"salted_equi_join supports only {sorted(allowed)} (the "
            f"salt-replicated right side breaks {how!r} semantics)"
        )
    lsalted = left.withColumn("_salt", _salt_of(F.col(salt_from), n_salts))
    rsalted = right.select(
        "*",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")
        ).alias("_salt"),
    )
    out = lsalted.join(rsalted, [key, "_salt"], how)
    return out.drop("_salt")


def salted_agg(
    df: DataFrame,
    key: str,
    salt_from: str,
    aggs: dict,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation for count/sum-like metrics:
    ``aggs`` maps output name -> source column ('*' for count).

    Phase 1 groups by (key, salt) — a hot key becomes N medium groups;
    phase 2 sums the partials per key.
    """
    salted = df.withColumn("_salt", _salt_of(F.col(salt_from), n_salts))
    partial_exprs = []
    for name, src in aggs.items():
        if src == "*":
            partial_exprs.append(F.count("*").alias(name))
        else:
            partial_exprs.append(F.sum(src).alias(name))
    partial = salted.groupBy(key, "_salt").agg(*partial_exprs)
    final_exprs = [F.sum(name).alias(name) for name in aggs]
    return partial.groupBy(key).agg(*final_exprs)
