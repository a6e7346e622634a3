"""spark-submit driver script (pdf_parser_spark/__main__.py)."""

import shutil
import tempfile

from pdf_parser_spark.__main__ import main
from pdf_parser_spark.fixtures.gen import fixture_corpus, to_spark_df


def test_main_pipeline_mode_writes_all_outputs(spark):
    tmp = tempfile.mkdtemp(prefix="main_", dir="/root/repo")
    try:
        to_spark_df(spark, fixture_corpus(n_docs=8)).write.parquet(
            f"{tmp}/in"
        )
        counts = main(
            ["--mode", "pipeline", "--input", f"{tmp}/in",
             "--output", f"{tmp}/out"],
            spark=spark,
        )
        assert set(counts) == {
            "spans_out", "quarantine", "pages", "metadata", "toc",
            "sections", "metrics",
        }
        assert counts["spans_out"] > 0 and counts["metrics"] > 0
        # outputs are re-readable parquet with the expected key column
        df = spark.read.parquet(f"{tmp}/out/spans_out")
        assert "doc_id" in df.columns and "order" in df.columns
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_main_resume_mode_summary(spark):
    tmp = tempfile.mkdtemp(prefix="main_", dir="/root/repo")
    try:
        to_spark_df(spark, fixture_corpus(n_docs=6)).write.parquet(
            f"{tmp}/in"
        )
        summary = main(
            ["--mode", "resume", "--input", f"{tmp}/in",
             "--output", f"{tmp}/out"],
            spark=spark,
        )
        assert isinstance(summary, dict) and summary
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_main_bucketize_then_pipeline_from_table(spark):
    """bucketize writes the doc_id-bucketed catalog table; pipeline mode
    reads it back via the table: ref and produces the same spans_out
    count as the parquet path."""
    tmp = tempfile.mkdtemp(prefix="main_", dir="/root/repo")
    try:
        to_spark_df(spark, fixture_corpus(n_docs=8)).write.parquet(
            f"{tmp}/in"
        )
        summary = main(
            ["--mode", "bucketize", "--input", f"{tmp}/in",
             "--output", "table:docs_bucketed_cli_test",
             "--buckets", "4", "--table-path", f"{tmp}/bucketed"],
            spark=spark,
        )
        # row-complete: every raw row (incl. malformed docs the fixture
        # plants for the quarantine path) survives the re-layout
        assert summary["docs"] == spark.read.parquet(f"{tmp}/in").count()
        counts = main(
            ["--mode", "pipeline",
             "--input", "table:docs_bucketed_cli_test",
             "--output", f"{tmp}/out"],
            spark=spark,
        )
        baseline = main(
            ["--mode", "pipeline", "--input", f"{tmp}/in",
             "--output", f"{tmp}/out_plain"],
            spark=spark,
        )
        assert counts == baseline
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_bucketed_cli_test")
        shutil.rmtree(tmp, ignore_errors=True)


def test_main_bucketize_normalize_html(spark):
    """bucketize --normalize-html strips raw-HTML spans during the
    one-time re-layout: the bucketed table holds pre-normalized docs, so
    a plain (no-flag) pipeline over it quarantines nothing as
    unknown_kind and emits the stripped content."""
    import random

    from pdf_parser_spark.fixtures.gen import _doc_to_spans, html_doc

    rng = random.Random(31)
    docs = [_doc_to_spans(html_doc(rng, f"bh-{i}"), rng) for i in range(3)]
    tmp = tempfile.mkdtemp(prefix="main_nh_", dir="/root/repo")
    try:
        to_spark_df(spark, docs).write.parquet(f"{tmp}/in")
        summary = main(
            ["--mode", "bucketize", "--input", f"{tmp}/in",
             "--output", "table:docs_nh_cli_test",
             "--buckets", "2", "--table-path", f"{tmp}/bucketed",
             "--normalize-html"],
            spark=spark,
        )
        assert summary["docs"] == 3
        tbl = spark.table("docs_nh_cli_test")
        kinds = {
            s.kind for r in tbl.collect() for s in (r.spans or [])
        }
        assert "html" not in kinds and "text" in kinds
        counts = main(
            ["--mode", "pipeline", "--input", "table:docs_nh_cli_test",
             "--output", f"{tmp}/out"],
            spark=spark,
        )
        assert counts["quarantine"] == 0
        texts = [
            r.text for r in spark.read.parquet(f"{tmp}/out/spans_out")
            .collect() if r.text
        ]
        assert any("see also" in t for t in texts)
        assert not any("/privacy" in t for t in texts)
    finally:
        spark.sql("DROP TABLE IF EXISTS docs_nh_cli_test")
        shutil.rmtree(tmp, ignore_errors=True)
