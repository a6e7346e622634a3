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


def test_batch_replay_is_idempotent(spark):
    """Crash-window semantics: a batch re-run after a crash between the
    sink write and the checkpoint commit must NOT duplicate rows — the
    per-batch dynamic partition overwrite replaces, never appends."""
    from pdf_parser_spark.operators import pages as P

    tmp = tempfile.mkdtemp(prefix="replay_", dir="/root/repo")
    try:
        out_dir = f"{tmp}/out"
        docs = to_spark_df(spark, fixture_corpus(n_docs=4))
        out = P.span_sequence_df(P.valid_spans(P.explode_spans(docs)))

        I.write_batch(out, 0, out_dir)
        n_once = spark.read.parquet(out_dir).count()
        # simulated replay of the SAME batch id (checkpoint not committed)
        I.write_batch(out, 0, out_dir)
        n_twice = spark.read.parquet(out_dir).count()
        assert n_once == n_twice > 0

        # a genuinely new batch still lands alongside
        I.write_batch(out, 1, out_dir)
        assert spark.read.parquet(out_dir).count() == 2 * n_once
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_available_now_normalize_html(spark):
    """Streaming ingest with normalize_html=True: raw-HTML payload spans
    land in the output as stripped text spans (chrome links absent,
    body words present) instead of being silently dropped as
    unknown_kind."""
    import random

    from pdf_parser_spark.fixtures.gen import _doc_to_spans, html_doc

    rng = random.Random(23)
    docs = [_doc_to_spans(html_doc(rng, "sh-1"), rng)]
    tmp = tempfile.mkdtemp(prefix="stream_html_", dir="/root/repo")
    try:
        to_spark_df(spark, docs).coalesce(1).write.mode("append").parquet(
            f"{tmp}/in"
        )
        I.run_available_now(
            spark, f"{tmp}/in", f"{tmp}/out", f"{tmp}/ckpt",
            normalize_html=True,
        )
        rows = spark.read.parquet(f"{tmp}/out").collect()
        text = "\n".join(r.text for r in rows if r.text)
        assert "see also" in text
        assert "/privacy" not in text and "Home" not in text
        assert {r.kind for r in rows} <= {"text", "image"}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
