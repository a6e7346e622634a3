"""Watermarked event-time windowed aggregation: late data inside the
allowance is counted exactly; data later than the watermark is dropped
and its window's state evicted (streaming/arrival.py)."""

import datetime
import shutil
import tempfile

from pdf_parser_spark.streaming import arrival as AR


def _ts(h, m, s):
    return datetime.datetime(2026, 1, 1, h, m, s)


def _write_wave(spark, rows, in_dir):
    spark.createDataFrame(rows, AR.ARRIVAL_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)


def _collector(batches):
    def sink(batch_df, batch_id):
        batches[batch_id] = [r.asDict() for r in batch_df.collect()]

    return sink


WAVE1 = [
    ("d1", "text", "alpha", _ts(10, 0, 5)),
    ("d1", "text", "beta", _ts(10, 0, 20)),
    ("d2", "table", "gamma", _ts(10, 1, 30)),
]
# wave 2: one fresh span far ahead, one span 80+ minutes LATE in event
# time (lands in the already-closed [10:00,10:01) window)
WAVE2 = [
    ("d3", "text", "delta", _ts(11, 30, 0)),
    ("d9", "text", "late!", _ts(10, 0, 40)),
]


def _run_waves(spark, lateness):
    tmp = tempfile.mkdtemp(prefix="arrival_", dir="/root/repo")
    try:
        in_dir, ckpt = f"{tmp}/in", f"{tmp}/ckpt"
        batches = {}
        _write_wave(spark, WAVE1, in_dir)
        AR.run_arrival_metrics(
            spark, in_dir, ckpt, _collector(batches), lateness=lateness
        )
        _write_wave(spark, WAVE2, in_dir)
        q = AR.run_arrival_metrics(
            spark, in_dir, ckpt, _collector(batches), lateness=lateness
        )
        return batches, q
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _window_rows(batches, hms):
    start = _ts(*hms)
    return [
        r
        for rows in batches.values()
        for r in rows
        if r["window_start"] == start
    ]


def test_late_span_beyond_watermark_is_dropped(spark):
    # lateness 10s: after wave 1 the watermark is 10:01:20, past the
    # [10:00,10:01) window's end — wave 2's late span must be dropped.
    batches, _ = _run_waves(spark, lateness="10 seconds")
    w0 = _window_rows(batches, (10, 0, 0))
    assert len(w0) == 1  # emitted once (wave 1), never updated again
    assert w0[0]["n_spans"] == 2 and w0[0]["n_docs"] == 1
    assert w0[0]["n_chars"] == len("alpha") + len("beta")
    # the fresh wave-2 span IS counted
    w_fresh = _window_rows(batches, (11, 30, 0))
    assert len(w_fresh) == 1 and w_fresh[0]["n_spans"] == 1


def test_late_span_inside_allowance_is_counted(spark):
    # lateness 2h: the same late span is inside the allowance, so the
    # [10:00,10:01) window is UPDATED in the second run: 2 → 3 spans.
    batches, _ = _run_waves(spark, lateness="2 hours")
    w0 = sorted(_window_rows(batches, (10, 0, 0)), key=lambda r: r["n_spans"])
    assert [r["n_spans"] for r in w0] == [2, 3]
    assert w0[-1]["n_docs"] == 2  # d1 + the late d9


def test_finalized_window_state_is_evicted(spark):
    # With the short allowance, rows dropped by the watermark and state
    # eviction both show in the final progress: the state store holds
    # only windows newer than the watermark (2 of 3 windows by run end),
    # and exactly one input row was dropped as too late.
    batches, query = _run_waves(spark, lateness="10 seconds")
    progress = [
        p
        for p in (query.recentProgress or [])
        if p.get("stateOperators")
    ]
    assert progress, "no stateOperators progress recorded"
    last = progress[-1]["stateOperators"][0]
    assert last["numRowsTotal"] <= 2
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in progress
    )
    assert dropped == 1
