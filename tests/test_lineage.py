"""Resume/idempotency: kill after wave k, re-run, assert completed
buckets are skipped and the final output is complete with no duplicates
(SURVEY.md §5 resume test)."""

import shutil
import tempfile

import pytest

from pdf_parser_spark.streaming import lineage as L


def test_resume_after_failure(spark, docs_df, oracle_results):
    out_dir = tempfile.mkdtemp(prefix="lineage_", dir="/root/repo")
    try:
        # first run dies after 1 of 2 waves (8 of 16 buckets done)
        with pytest.raises(RuntimeError, match="injected failure"):
            L.run_resumable(
                spark, docs_df, out_dir, run_id="r1",
                n_buckets=16, wave_size=8, fail_after_waves=1,
            )
        done_after_kill = L.completed_buckets(spark, out_dir)
        assert 0 < len(done_after_kill) <= 8

        # resume: completed buckets must be skipped, the rest processed
        summary = L.run_resumable(
            spark, docs_df, out_dir, run_id="r2",
            n_buckets=16, wave_size=8,
        )
        assert set(summary["skipped_buckets"]) == done_after_kill
        assert not set(summary["processed_buckets"]) & done_after_kill

        # final spans_out is complete and duplicate-free vs the oracle
        rows = spark.read.parquet(f"{out_dir}/spans_out").collect()
        got = {}
        for r in rows:
            got.setdefault(r.doc_id, []).append(
                (r.kind, r.text, r.media_ref, r.order)
            )
        for doc_id, res in oracle_results.items():
            want = [
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in res["spans_out"]
            ]
            have = sorted(got.get(doc_id, []), key=lambda t: t[3])
            assert have == want, f"resume output mismatch for {doc_id}"
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
