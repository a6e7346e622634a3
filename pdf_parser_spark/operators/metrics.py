"""Validation metrics — reference ``validation/validation_report.py`` +
``validation/coverage_calculator.py`` + ``section_parser.py:428-474``
(SURVEY.md §2.4 A1-A11), generalized from one global report to one row per
``doc_id`` (the 10^12-doc shape; a global report is a trivial second agg).

All native aggregations.  ``bround`` (HALF_EVEN) mirrors Python's banker's
``round(x, 2)`` in safe_percentage (coverage_calculator.py:216-222).
The TOC covered-page count uses an interval-sweep window (running max of
prior interval ends) instead of exploding ``sequence()`` ranges — constant
memory per entry at any page range (SURVEY.md A5 "interval arithmetic").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pdf_parser_spark.operators.exprs import non_blank


def _pct(n: F.Column, d: F.Column) -> F.Column:
    """safe_percentage (coverage_calculator.py:216-222)."""
    return F.when(d == 0, F.lit(0.0)).otherwise(
        F.bround(n.cast("double") / d * 100, 2)
    )


def _covered_pages(toc: DataFrame, totals: DataFrame) -> DataFrame:
    """A5: cardinality of the union of entry page ranges
    (coverage_calculator.py:224-258) via interval sweep, no explode."""
    valid = toc.filter(F.col("page") > 0).join(totals, "doc_id", "left")
    w_lead = Window.partitionBy("doc_id").orderBy("entry_order")
    iv = valid.select(
        "doc_id",
        F.col("page").alias("start"),
        F.greatest(
            F.coalesce(
                F.lead("page").over(w_lead) - 1,
                F.coalesce("total_pages", F.lit(0)),
            ),
            F.col("page"),
        ).alias("end"),
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = iv.withColumn(
        "eff_start",
        F.greatest(F.col("start"), F.coalesce(F.max("end").over(w_prev) + 1,
                                              F.col("start"))),
    ).withColumn(
        "contrib", F.greatest(F.col("end") - F.col("eff_start") + 1, F.lit(0))
    )
    return swept.groupBy("doc_id").agg(
        F.sum("contrib").alias("toc_covered_pages")
    )


def metrics_df(
    docs: DataFrame,
    pages: DataFrame,
    toc: DataFrame,
    sections: DataFrame,
    metadata: DataFrame,
) -> DataFrame:
    """One validation-summary row per doc (schema = refsem.doc_metrics)."""
    base = docs.select("doc_id")

    has_text = non_blank(F.coalesce("text", F.lit("")))
    has_tables = F.col("n_tables") > 0
    has_images = F.col("n_images") > 0
    has_annots = F.col("n_annots") > 0
    has_layout = F.col("n_layout") > 0
    has_content = has_text | has_tables | has_images | has_annots
    page_content_len = (
        F.when(has_text, F.length("text")).otherwise(0)
        + F.col("table_text_len")
        + F.col("annot_text_len")
    )

    page_agg = pages.groupBy("doc_id").agg(
        F.count("*").alias("total_pages"),
        F.sum(has_text.cast("long")).alias("pages_with_text"),
        F.sum(has_tables.cast("long")).alias("n_pages_tables"),
        F.sum(has_images.cast("long")).alias("n_pages_images"),
        F.sum(has_annots.cast("long")).alias("n_pages_annots"),
        F.sum(has_layout.cast("long")).alias("n_pages_layout"),
        F.sum(has_content.cast("long")).alias("pages_with_content"),
        F.sum(F.when(has_content, page_content_len).otherwise(0)).alias(
            "total_content_length"
        ),
        # A4 diversity: distinct content types present anywhere in the doc
        (
            F.max(has_text.cast("int"))
            + F.max(has_tables.cast("int"))
            + F.max(has_images.cast("int"))
            + F.max(has_annots.cast("int"))
        ).alias("content_diversity_score"),
    )

    toc_agg = toc.groupBy("doc_id").agg(
        F.count("*").alias("total_toc_entries")
    )

    sec_content = F.coalesce(F.col("content"), F.lit(""))
    sec_agg = sections.groupBy("doc_id").agg(
        F.count("*").alias("sections_parsed"),
        F.sum(
            (F.coalesce("section_id", F.lit("")) != "").cast("long")
        ).alias("toc_sections"),
        F.sum(
            (F.coalesce("section_id", F.lit("")) == "").cast("long")
        ).alias("non_toc_sections"),
        F.sum(
            (
                (sec_content != "")
                & (
                    F.lower(sec_content).contains("table")
                    | sec_content.contains("|")
                )
            ).cast("long")
        ).alias("sections_with_tables"),
        F.sum(
            (
                (sec_content != "")
                & (
                    F.lower(sec_content).contains("image")
                    | F.lower(sec_content).contains("figure")
                    | F.lower(sec_content).contains("diagram")
                )
            ).cast("long")
        ).alias("sections_with_images"),
        F.sum(F.length(sec_content)).alias("total_section_content_length"),
        F.countDistinct("page").alias("section_pages_covered"),
    )

    # A11/F13: required-field validation (metadata_validator.py:20-55);
    # 'falsy' for our string schema means null or empty.
    req = ["doc_title", "revision", "version", "release_date"]
    meta_ok = None
    for f in req:
        c = F.coalesce(F.col(f), F.lit("")) != ""
        meta_ok = c if meta_ok is None else (meta_ok & c)
    meta_status = metadata.select(
        "doc_id",
        F.when(meta_ok, F.lit("Valid"))
        .otherwise(F.lit("Invalid/Missing"))
        .alias("metadata_status"),
    )

    totals = page_agg.select("doc_id", "total_pages")
    covered = _covered_pages(toc, totals)

    out = (
        base.join(meta_status, "doc_id", "left")
        .join(page_agg, "doc_id", "left")
        .join(toc_agg, "doc_id", "left")
        .join(sec_agg, "doc_id", "left")
        .join(covered, "doc_id", "left")
    )
    out = out.fillna(
        {
            "metadata_status": "Missing",
            "total_pages": 0,
            "pages_with_text": 0,
            "n_pages_tables": 0,
            "n_pages_images": 0,
            "n_pages_annots": 0,
            "n_pages_layout": 0,
            "pages_with_content": 0,
            "total_content_length": 0,
            "content_diversity_score": 0,
            "total_toc_entries": 0,
            "sections_parsed": 0,
            "toc_sections": 0,
            "non_toc_sections": 0,
            "sections_with_tables": 0,
            "sections_with_images": 0,
            "total_section_content_length": 0,
            "section_pages_covered": 0,
            "toc_covered_pages": 0,
        }
    )

    tp = F.col("total_pages")
    text_cov = _pct(F.col("pages_with_text"), tp)
    table_cov = _pct(F.col("n_pages_tables"), tp)
    image_cov = _pct(F.col("n_pages_images"), tp)
    annot_cov = _pct(F.col("n_pages_annots"), tp)
    layout_cov = _pct(F.col("n_pages_layout"), tp)

    return out.select(
        "doc_id",
        "metadata_status",
        "total_toc_entries",
        "sections_parsed",
        "pages_with_text",
        "toc_covered_pages",
        _pct(F.col("pages_with_text"), tp).alias("page_coverage_pct"),
        text_cov.alias("text_coverage"),
        table_cov.alias("table_coverage"),
        image_cov.alias("image_coverage"),
        annot_cov.alias("annotation_coverage"),
        layout_cov.alias("layout_coverage"),
        (
            text_cov * 0.4 + table_cov * 0.2 + image_cov * 0.2
            + annot_cov * 0.1 + layout_cov * 0.1
        ).alias("overall_coverage"),
        "total_pages",
        "pages_with_content",
        F.when(F.col("pages_with_content") > 0,
               F.col("total_content_length").cast("double")
               / F.col("pages_with_content"))
        .otherwise(F.lit(0.0))
        .alias("average_content_length"),
        "content_diversity_score",
        _pct(F.col("pages_with_content"), tp).alias(
            "extraction_completeness"
        ),
        "toc_sections",
        "non_toc_sections",
        "sections_with_tables",
        "sections_with_images",
        "total_section_content_length",
        "section_pages_covered",
    )


def corpus_metrics_df(metrics: DataFrame) -> DataFrame:
    """Corpus-level validation summary: ONE row rolling up the per-doc
    metrics — the reference's actual report shape
    (validation_report.py:109-126: Metadata Status, Total ToC Entries,
    Sections Parsed, Pages with Text, TOC Covered Pages, Page Coverage),
    generalized from one document to the whole corpus.

    Only INTEGER columns are summed (deterministic under any partition /
    reduction order); the two percentages are single divisions of those
    exact sums, replaying safe_percentage at corpus granularity.  Float
    per-doc columns (average_content_length, overall_coverage) are NOT
    re-aggregated — a double sum's value depends on reduction order, so
    it could never hash-match an oracle; re-derive them from the integer
    totals instead."""
    agg = metrics.agg(
        F.count("*").alias("n_docs"),
        F.sum(
            (F.col("metadata_status") == "Valid").cast("long")
        ).alias("docs_metadata_valid"),
        F.sum("total_toc_entries").cast("long").alias("total_toc_entries"),
        F.sum("sections_parsed").cast("long").alias("sections_parsed"),
        F.sum("pages_with_text").cast("long").alias("pages_with_text"),
        F.sum("total_pages").cast("long").alias("total_pages"),
        F.sum("toc_covered_pages").cast("long").alias("toc_covered_pages"),
        F.sum("pages_with_content").cast("long").alias(
            "pages_with_content"
        ),
        F.sum("toc_sections").cast("long").alias("toc_sections"),
        F.sum("non_toc_sections").cast("long").alias("non_toc_sections"),
        F.sum("sections_with_tables").cast("long").alias(
            "sections_with_tables"
        ),
        F.sum("sections_with_images").cast("long").alias(
            "sections_with_images"
        ),
        F.sum("total_section_content_length").cast("long").alias(
            "total_section_content_length"
        ),
    )
    return agg.select(
        "*",
        _pct(F.col("pages_with_text"), F.col("total_pages")).alias(
            "page_coverage_pct"
        ),
        _pct(F.col("pages_with_content"), F.col("total_pages")).alias(
            "extraction_completeness"
        ),
    )
