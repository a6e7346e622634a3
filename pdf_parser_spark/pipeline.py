"""End-to-end pipeline — the Spark equivalent of the reference's five-step
orchestrator (main.py:96-116):

  1. span explode + quarantine + page derivation   (≙ PDF Text Extraction)
  2. metadata extraction                            (≙ Metadata Extraction)
  3. TOC parsing                                    (≙ TOC Parsing)
  4. section assembly                               (≙ Section Parsing)
  5. validation metrics                             (≙ Validation Report)

Where the reference re-reads JSONL files between steps
(main.py:194-202, section_parser.py:94-107 — SURVEY.md §2 S7), this build
holds ONE cached pages DataFrame reused by steps 2-5 (SURVEY.md §4 P9).

Scale: the input is read with its on-disk doc_id-range layout
(fixtures/gen.write_parquet mirrors the production Iceberg bucketing);
every per-doc stage shuffles on doc_id only, so AQE coalesces them onto
one exchange, and mega-doc skew is spread by the (doc_id, page) windows
inside pages.span_sequence_df (SURVEY.md §4 P6).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from pdf_parser_spark.config import DEFAULT_CONFIG, PipelineConfig
from pdf_parser_spark.operators import metadata as metadata_op
from pdf_parser_spark.operators import metrics as metrics_op
from pdf_parser_spark.operators import pages as pages_op
from pdf_parser_spark.operators import sections as sections_op
from pdf_parser_spark.operators import toc as toc_op
from pdf_parser_spark.schemas import DOCUMENTS_SPANS


@dataclass
class PipelineResult:
    quarantine: DataFrame
    spans_out: DataFrame
    pages: DataFrame
    metadata: DataFrame
    toc: DataFrame
    sections: DataFrame
    metrics: DataFrame
    extra_cached: tuple = ()

    def unpersist(self) -> None:
        for df in (self.pages, self.metadata, self.toc,
                   self.sections, *self.extra_cached):
            try:
                df.unpersist()
            except Exception:
                pass


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """Read the interleaved-spans input table (BASELINE.json input_hint
    shape): ``iceberg:<catalog.db.table>`` refs go through the Iceberg
    catalog (sources/tables.py gate), parquet paths read with the schema
    pinned — no inference pass."""
    from pdf_parser_spark.sources.tables import read_table

    return read_table(spark, path, schema=DOCUMENTS_SPANS)


def run_pipeline(
    docs: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    cache: bool = True,
    normalize_html: bool = False,
) -> PipelineResult:
    extra_cached: list = []
    if normalize_html:
        # north rule: the corpus interleaves raw-HTML payload spans with
        # text + media — strip boilerplate and rewrite them to text spans
        # in place before extraction (kind validation runs AFTER the
        # rewrite, so normalized html never hits unknown_kind).  Off by
        # default: production runs normalize once at ingest
        # (functions/boilerplate.strip_html_spans); this inline variant
        # is for un-normalized corpora, and its extra work + cache are
        # proportional to the html-bearing rows only — ``docs`` for the
        # doc_id-universe consumers (metadata/metrics) stays the raw
        # scan.
        from pdf_parser_spark.functions.boilerplate import (
            normalize_html_flat,
        )

        flat = normalize_html_flat(
            pages_op.explode_spans_raw(docs),
            cache_html=cache,
            cache_registry=extra_cached,
        ).withColumn("error_kind", pages_op.error_kind_expr(cfg))
    else:
        flat = pages_op.explode_spans(docs, cfg)
    quarantine = pages_op.quarantine_df(flat)
    valid = pages_op.valid_spans(flat)
    # W2 reassembly: mega-doc salting on by default (SURVEY §4 P6) —
    # docs past cfg.mega_doc_span_threshold take the two-phase chunked
    # path so no single task sorts a pathological doc alone; output is
    # bit-identical either way.
    spans_out = (
        pages_op.span_sequence_skew_df(valid, cfg, docs=docs)
        if cfg.mega_doc_salting
        else pages_op.span_sequence_df(valid)
    )

    pages = pages_op.pages_df(valid, cfg)
    if cache:
        # steps 2-5 all read pages; one materialization instead of the
        # reference's three JSONL re-reads (S7).  Eager count: every stage
        # fans out to several consumers inside single downstream jobs, and
        # a lazy cache would recompute the lineage once per branch before
        # any partition lands in the cache.  In production these stage
        # boundaries are Iceberg tables (write = the materialization).
        pages = pages.persist(StorageLevel.MEMORY_AND_DISK)
        pages.count()

    metadata = metadata_op.metadata_df(docs, pages, cfg)
    if cache:
        metadata = metadata.persist(StorageLevel.MEMORY_AND_DISK)
        metadata.count()
    toc = toc_op.toc_entries_df(
        pages, metadata, cfg, persist=cache, cache_registry=extra_cached
    )
    if cache:
        toc = toc.persist(StorageLevel.MEMORY_AND_DISK)
        toc.count()
    sections = sections_op.sections_df(
        pages, toc, metadata, cfg, persist=cache, cache_registry=extra_cached
    )
    if cache:
        sections = sections.persist(StorageLevel.MEMORY_AND_DISK)
        sections.count()
    metrics = metrics_op.metrics_df(docs, pages, toc, sections, metadata)

    return PipelineResult(
        quarantine=quarantine,
        spans_out=spans_out,
        pages=pages,
        metadata=metadata,
        toc=toc,
        sections=sections,
        metrics=metrics,
        extra_cached=tuple(extra_cached),
    )


def write_outputs(result: PipelineResult, out_dir: str) -> None:
    """Persist every stage table through the table seam (the reference's
    JSONL sinks S3; ``out_dir`` may be an ``iceberg:`` ref — V2
    createOrReplace — or a filesystem path — parquet overwrite)."""
    from pdf_parser_spark.sources.tables import sub_ref, write_table

    for name in ("quarantine", "spans_out", "metadata", "toc",
                 "sections", "metrics"):
        write_table(getattr(result, name), sub_ref(out_dir, name))
