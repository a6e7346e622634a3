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
