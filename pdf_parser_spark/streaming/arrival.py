"""Event-time windowed arrival metrics — watermarks for late data.

The reference computes its health counters once, over a complete corpus
(validation_report.py:109-177); ``ingest.py`` keeps that batch shape and
needs no event-time semantics because its input is a closed set of
files.  A scraper fleet feeding the 10^12-doc table is different: spans
carry a ``fetched_at`` event time, arrive hours out of order, and the
ops question is "how many spans/docs landed per fetch-time window" — a
windowed aggregation whose state would grow forever without a bound.

``withWatermark`` is that bound: once the watermark (max observed event
time minus the lateness allowance) passes a window's end, the window is
finalized, its state row is evicted from the store, and spans arriving
even later are dropped at the aggregation — steady-state state size
tracks the lateness allowance, not the stream's lifetime.  Dropped-late
spans are an accepted, *configured* loss (the allowance is the knob);
anything inside the allowance is exact.

Scale shape: the only shuffle is the groupBy on (window, kind) — tiny
cardinality; counts are map-side partial-aggregated, and doc
cardinality uses ``approx_count_distinct`` (HLL, mergeable sketch) so
no per-doc state ever reaches the store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# One arriving span per row, stamped with its fetch event time.
ARRIVAL_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), nullable=False),
        StructField("kind", StringType()),
        StructField("text", StringType()),
        StructField("fetched_at", TimestampType(), nullable=False),
    ]
)


def arrival_metrics_stream(
    spans: DataFrame,
    event_time_col: str = "fetched_at",
    window: str = "1 minute",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Per-(event-time window, kind) arrival counters with bounded state.

    ``lateness`` is the watermark delay: spans later than that behind
    the max observed event time are dropped; windows older than it are
    finalized and evicted from the state store.
    """
    return (
        spans.withWatermark(event_time_col, lateness)
        .groupBy(
            F.window(F.col(event_time_col), window).alias("win"),
            F.col("kind"),
        )
        .agg(
            F.count("*").alias("n_spans"),
            F.approx_count_distinct("doc_id").alias("n_docs"),
            F.sum(F.length(F.coalesce("text", F.lit("")))).alias(
                "n_chars"
            ),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "kind",
            "n_spans",
            "n_docs",
            "n_chars",
        )
    )


def read_arrivals_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(ARRIVAL_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(path)
    )


def run_arrival_metrics(
    spark: SparkSession,
    in_path: str,
    checkpoint: str,
    sink,
    window: str = "1 minute",
    lateness: str = "10 minutes",
):
    """Drain everything currently available through the windowed agg in
    UPDATE mode (each trigger emits only the windows it changed) into
    ``sink(batch_df, batch_id)``.  The watermark survives restarts in
    the checkpoint's offset log, so a later invocation drops spans that
    are late relative to event time seen in *earlier* invocations —
    the cross-run late-data contract tests/test_arrival.py pins.
    """
    metrics = arrival_metrics_stream(
        read_arrivals_stream(spark, in_path),
        window=window,
        lateness=lateness,
    )
    query = (
        metrics.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
