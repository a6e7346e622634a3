"""Structured Streaming ingest — the continuous-arrival variant of the
batch pipeline (SURVEY.md §2.9).

The reference is one-shot batch; at 10^12 docs new documents arrive
continuously.  ``Trigger.AvailableNow`` + ``checkpointLocation`` gives
exactly-once incremental processing over a growing table directory: each
invocation processes only files not yet recorded in the checkpoint — the
streaming twin of the lineage/anti-join resume in ``lineage.py``.

No event-time semantics are built (the reference has none — SURVEY.md
§2.9: watermarks/windows N/A); the stream is a file-discovery incremental
batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pdf_parser_spark.config import DEFAULT_CONFIG, PipelineConfig
from pdf_parser_spark.operators import pages as pages_op
from pdf_parser_spark.schemas import DOCUMENTS_SPANS


def read_documents_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SPANS)
        # bound per-trigger work so one trigger never bites off more than
        # the cluster chews (backpressure at the source)
        .option("maxFilesPerTrigger", 64)
        .parquet(path)
    )


def spans_out_stream(docs: DataFrame,
                     cfg: PipelineConfig = DEFAULT_CONFIG) -> DataFrame:
    """Flagship W2 on a stream: the per-doc reassembly uses only
    intra-batch windows keyed by doc_id — valid because a document's spans
    arrive in one file (doc-atomic ingest), so every micro-batch holds
    whole documents."""
    flat = pages_op.explode_spans(docs, cfg)
    return pages_op.span_sequence_df(pages_op.valid_spans(flat))


def run_available_now(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
):
    """Process everything currently available, then stop.  Re-invoking
    after new files land processes ONLY the new files (checkpointed file
    index) — kill-resume safe via the sink's idempotent file commit."""
    docs = read_documents_stream(spark, in_path)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = spans_out_stream(batch_df, cfg)
        out.write.mode("append").parquet(out_path)

    query = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
