"""Spark ↔ oracle parity for quarantine, page derivation, W2 reassembly,
and comprehensive content assembly (the north-rule invariant)."""

from pdf_parser_spark.operators import pages as P


def _flat(docs_df):
    return P.explode_spans(docs_df)


def test_quarantine_parity(docs_df, oracle_results):
    got = {
        (r["doc_id"], r["span_seq"], r["error_kind"])
        for r in P.quarantine_df(_flat(docs_df)).collect()
    }
    want = {
        (doc_id, q["span_seq"], q["error_kind"])
        for doc_id, res in oracle_results.items()
        for q in res["quarantine"]
    }
    assert got == want


def test_span_sequence_parity(docs_df, oracle_results):
    """Exact (kind, text, media_ref, order) per-doc equality — the
    BASELINE.json correctness invariant."""
    rows = P.span_sequence_df(P.valid_spans(_flat(docs_df))).collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r)
    n_docs_with_output = 0
    for doc_id, res in oracle_results.items():
        want = [
            (s["kind"], s["text"], s["media_ref"], s["order"], s["seq"],
             s["page"])
            for s in res["spans_out"]
        ]
        have = sorted(got.get(doc_id, []), key=lambda r: r.order)
        have = [
            (r.kind, r.text, r.media_ref, r.order, r.seq, r.page)
            for r in have
        ]
        assert have == want, f"span sequence mismatch for {doc_id}"
        if want:
            n_docs_with_output += 1
    assert n_docs_with_output > 10  # corpus actually exercises the op


def test_pages_parity(docs_df, oracle_results):
    rows = P.pages_df(P.valid_spans(_flat(docs_df))).collect()
    got = {(r.doc_id, r.page): r for r in rows}
    from pdf_parser_spark.oracle import refsem

    n_pages = 0
    for doc_id, res in oracle_results.items():
        for pg in res["pages"]:
            r = got[(doc_id, pg["page"])]
            assert r.text == pg["text"], (doc_id, pg["page"])
            assert r.content == refsem.comprehensive_page_content(pg), (
                doc_id,
                pg["page"],
            )
            assert r.total_pages == len(res["pages"])
            n_pages += 1
        # spark must not invent extra pages
        spark_pages = {p for (d, p) in got if d == doc_id}
        assert spark_pages == {pg["page"] for pg in res["pages"]}
    assert n_pages > 50
