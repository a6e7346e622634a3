"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship W2 span-sequence extraction on the
sf0.001 slice; ``queries()``/``oracle_sql()`` expose the operator registry
in ``pdf_parser_spark.driver_queries`` — 69 queries, every one with a
DuckDB value-hash oracle.  That includes the flagship, the zero-TOC
pipeline composites, AND (round 3) the TOC-BEARING composites
``pipeline_toc`` / ``pipeline_toc_sections`` / ``pipeline_toc_metrics``,
whose corpus drives the X1 battery → quality gates → W3 dedup → range-
join section path end-to-end under hash comparison; the TOC regex
battery is additionally gated by the oracle-parity pytest + bit-for-bit
reference-golden replay.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pdf_parser_spark import driver_queries as _dq  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: synthesize the
    interleaved (doc_id, spans) input shape from the documents table and
    extract the ordered main-content span sequence (north-rule W2)."""
    return _dq.pipeline_span_sequence(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _dq.queries()


def oracle_sql() -> dict[str, str]:
    return _dq.oracle_sql()
