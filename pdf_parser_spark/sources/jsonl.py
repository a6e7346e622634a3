"""JSONL source/sink + report sink — reference ``utils/helpers.py`` and
``validation/validation_report.py`` (SURVEY.md §2.1 S3/S4/S5/S6).

The reference's reader silently skips blank lines, >1M-char lines, and
JSON parse errors (helpers.py:29, 67-95).  Here malformed rows land in a
structured quarantine DataFrame instead (north rule) — PERMISSIVE mode
with ``columnNameOfCorruptRecord`` keeps the raw line for triage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_line_length: int = 1_000_000,
) -> tuple[DataFrame, DataFrame]:
    """Return (good, quarantine).

    - blank lines: dropped by the JSON reader (as the reference does)
    - lines > ``max_line_length``: quarantined (helpers.py:29 guard)
    - JSON parse errors: quarantined with the raw line
      (vs. helpers.py:93-95 silent ``continue``)
    """
    full = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    oversize = F.length(
        F.coalesce(F.col(CORRUPT_COL), F.to_json(F.struct("*")))
    ) > max_line_length
    corrupt = F.col(CORRUPT_COL).isNotNull()
    quarantine = df.filter(corrupt | oversize).select(
        F.when(corrupt, F.lit("parse_error"))
        .otherwise(F.lit("oversize_line"))
        .alias("error_kind"),
        F.substring(
            F.coalesce(F.col(CORRUPT_COL), F.lit("")), 1, 100
        ).alias("raw"),
    )
    good = df.filter(~corrupt & ~oversize).drop(CORRUPT_COL)
    return good, quarantine


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> int:
    """S3: one JSON object per line, non-ASCII preserved (Spark's JSON
    writer emits UTF-8 unescaped — the ``ensure_ascii=False`` analog of
    helpers.py:46-65).  Returns the written row count via ``observe``
    (S6 — no second scan)."""
    from pyspark.sql import Observation

    obs = Observation("write_jsonl")
    observed = df.observe(obs, F.count(F.lit(1)).alias("n"))
    observed.write.mode(mode).json(path)
    return int(obs.get["n"])


def write_report(metrics: DataFrame, path: str) -> str:
    """S5: tiny metrics table → Excel via driver-side toPandas; falls back
    to JSON when no Excel writer is available (validation_report.py:189-208
    — including the reference's fallback-to-JSON behavior)."""
    pdf = metrics.toPandas()
    try:
        import openpyxl  # noqa: F401

        out = path if path.endswith(".xlsx") else f"{path}.xlsx"
        pdf.to_excel(out, index=False)
        return out
    except Exception:
        out = path.replace(".xlsx", "") + ".json"
        pdf.to_json(out, orient="records", lines=True, force_ascii=False)
        return out
