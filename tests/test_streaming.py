"""Structured Streaming ingest: AvailableNow incremental processing with
checkpointed exactly-once file discovery (SURVEY.md §2.9)."""

import shutil
import tempfile

from pdf_parser_spark.fixtures.gen import fixture_corpus, to_spark_df
from pdf_parser_spark.streaming import ingest as I


def test_available_now_incremental(spark, oracle_results):
    tmp = tempfile.mkdtemp(prefix="stream_", dir="/root/repo")
    try:
        in_dir = f"{tmp}/in"
        out_dir = f"{tmp}/out"
        ckpt = f"{tmp}/ckpt"
        corpus = fixture_corpus(n_docs=8)
        first, second = corpus[:5], corpus[5:]

        # batch 1 lands → trigger processes exactly those docs
        to_spark_df(spark, first).coalesce(1).write.mode("append").parquet(
            in_dir
        )
        I.run_available_now(spark, in_dir, out_dir, ckpt)
        ids1 = {
            r.doc_id
            for r in spark.read.parquet(out_dir).select("doc_id")
            .distinct().collect()
        }
        first_ids = {d["doc_id"] for d in first}
        second_ids = {d["doc_id"] for d in second}
        assert ids1 and ids1 <= first_ids and not ids1 & second_ids

        # batch 2 lands → ONLY the new docs are processed (no duplicates)
        to_spark_df(spark, second).coalesce(1).write.mode("append").parquet(
            in_dir
        )
        I.run_available_now(spark, in_dir, out_dir, ckpt)
        rows = spark.read.parquet(out_dir).collect()
        got = {}
        for r in rows:
            got.setdefault(r.doc_id, []).append(
                (r.kind, r.text, r.media_ref, r.order)
            )
        # exactly-once: every doc's sequence matches the oracle once
        for d in corpus:
            doc_id = d["doc_id"]
            from pdf_parser_spark.oracle import refsem

            res = refsem.run_document(d)
            want = [
                (s["kind"], s["text"], s["media_ref"], s["order"])
                for s in res["spans_out"]
            ]
            have = sorted(got.get(doc_id, []), key=lambda t: t[3])
            assert have == want, f"streaming mismatch for {doc_id}"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
