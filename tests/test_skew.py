"""Salted join / aggregation: same results as the unsalted equivalents,
with the hot key spread across tasks."""

from pyspark.sql import functions as F

from pdf_parser_spark.operators import skew as K


def _hot_df(spark):
    # one hot media_ref (90% of rows) + a long tail
    rows = [(f"doc-{i:04d}", "hot-logo" if i % 10 else f"ref-{i}")
            for i in range(1000)]
    return spark.createDataFrame(rows, ["doc_id", "media_ref"])


def test_salted_join_matches_plain(spark):
    big = _hot_df(spark)
    dim = spark.createDataFrame(
        [("hot-logo", "image"), ("ref-0", "figure"), ("ref-50", "image")],
        ["media_ref", "media_type"],
    )
    plain = big.join(dim, "media_ref").select("doc_id", "media_type")
    salted = K.salted_equi_join(
        big, dim, key="media_ref", salt_from="doc_id", n_salts=8
    ).select("doc_id", "media_type")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_spreads_hot_key(spark):
    big = _hot_df(spark)
    dim = spark.createDataFrame([("hot-logo", "image")],
                                ["media_ref", "media_type"])
    joined = K.salted_equi_join(
        big, dim, key="media_ref", salt_from="doc_id", n_salts=8
    )
    # before the drop, rows of the hot key occupy >1 salt bucket
    salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(8)).cast("int")
    ).filter(F.col("media_ref") == "hot-logo")
    n_buckets = salted.select("_salt").distinct().count()
    assert n_buckets > 4
    assert joined.count() == 900


def test_salted_agg_matches_plain(spark):
    df = _hot_df(spark).withColumn("v", F.length("doc_id").cast("long"))
    plain = {
        (r.media_ref): (r.n, r.total)
        for r in df.groupBy("media_ref")
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r.media_ref): (r.n, r.total)
        for r in K.salted_agg(
            df, key="media_ref", salt_from="doc_id",
            aggs={"n": "*", "total": "v"}, n_salts=8,
        ).collect()
    }
    assert plain == salted


def _skewed_spans(spark, mega_spans=3000, normal_docs=6):
    """Flat valid spans: one mega doc (``mega_spans`` rows, page break
    every 7th span, image every 50th) + a handful of small docs."""
    rows = []
    for d in range(normal_docs):
        for s in range(10):
            kind = "page_break" if s % 4 == 3 else "text"
            rows.append(
                (f"n{d}", s, kind,
                 None if kind == "page_break" else f"doc{d} span {s} words",
                 None, s * 10)
            )
    for s in range(mega_spans):
        kind = (
            "page_break" if s % 7 == 6
            else "image" if s % 50 == 25
            else "text"
        )
        text = None if kind == "page_break" else f"mega span {s} payload"
        ref = f"img-{s}" if kind == "image" else None
        rows.append(("mega", s, kind, text, ref, s * 3))
    return spark.createDataFrame(
        rows, ["doc_id", "seq", "kind", "text", "media_ref", "offset"]
    )


def _low_threshold_cfg(threshold=500, buckets=8):
    from dataclasses import replace

    from pdf_parser_spark.config import DEFAULT_CONFIG

    return replace(
        DEFAULT_CONFIG,
        mega_doc_span_threshold=threshold,
        salt_buckets=buckets,
    )


def test_mega_doc_w2_bit_identical(spark):
    """span_sequence_skew_df must reproduce the single-window W2 output
    exactly — same rows, same order values — when a doc crosses the
    mega threshold."""
    from pdf_parser_spark.operators import pages as P

    valid = _skewed_spans(spark)
    cfg = _low_threshold_cfg()
    plain = sorted(map(tuple, P.span_sequence_df(valid).collect()))
    salted = sorted(
        map(tuple, P.span_sequence_skew_df(valid, cfg).collect())
    )
    assert plain == salted
    # the mega doc really took the two-phase path
    mega_ids = {r.doc_id for r in P.mega_doc_ids(valid, cfg).collect()}
    assert mega_ids == {"mega"}


def test_mega_doc_w2_bounds_task_sizes(spark):
    """Straggler bound: with N offset-quantile chunks, no single
    (doc, chunk) group — the unit of per-task window work in the
    two-phase path — holds more than ~2/N of the mega doc's spans
    (2× slack for quantile estimation error)."""
    from pdf_parser_spark.operators import pages as P

    cfg = _low_threshold_cfg(threshold=500, buckets=8)
    valid = _skewed_spans(spark, mega_spans=3000).filter(
        F.col("doc_id") == "mega"
    )
    chunked = P._with_obucket(valid, cfg)
    sizes = [
        r.n
        for r in chunked.groupBy("_obucket")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert len(sizes) == 8
    assert max(sizes) <= 2 * 3000 / 8


def _breakless_mega_spans(spark, mega_spans=3000):
    """One mega doc with ZERO page breaks (one giant page) and images
    sprinkled in — the canonical pathological case for per-(doc, page)
    windows: every span shares (doc_id, page)."""
    rows = []
    for s in range(mega_spans):
        kind = "image" if s % 40 == 20 else (
            "table" if s % 97 == 50 else "text"
        )
        ref = f"img-{s}" if kind == "image" else None
        rows.append(("mega", s, kind, f"span {s} body", ref, s * 3))
    rows.append(("tiny", 0, "text", "small doc", None, 0))
    return spark.createDataFrame(
        rows, ["doc_id", "seq", "kind", "text", "media_ref", "offset"]
    )


def test_breakless_mega_doc_bit_identical_and_chunk_bounded(spark):
    """A mega doc with NO page breaks must (a) reproduce the
    single-window output exactly — image/table ids included — and
    (b) keep every (doc, page, chunk) group, the per-task unit of the
    two-phase image/table-id windows, bounded by ~2/N of the doc
    (regression guard: _with_ids used to fall back to a whole
    (doc_id, page) window, refunneling the breakless doc into one
    task)."""
    from pdf_parser_spark.operators import pages as P

    cfg = _low_threshold_cfg(threshold=500, buckets=8)
    valid = _breakless_mega_spans(spark)
    plain = sorted(map(tuple, P.span_sequence_df(valid).collect()))
    salted = sorted(
        map(tuple, P.span_sequence_skew_df(valid, cfg).collect())
    )
    assert plain == salted
    chunked = P._with_obucket(
        valid.filter(F.col("doc_id") == "mega"), cfg
    )
    sizes = [
        r.n
        for r in P._with_page_two_phase(chunked)
        .groupBy("doc_id", "page", "_obucket")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    assert max(sizes) <= 2 * 3000 / 8


def test_skew_path_keeps_null_doc_id_rows(spark):
    """NULL doc_id survives valid_spans (only seq/kind/offset/text are
    quarantined), so the mega split must not silently drop it:
    ~isin(NULL) is NULL under three-valued logic, which filter()
    treats as false in BOTH branches."""
    from pdf_parser_spark.operators import pages as P

    cfg = _low_threshold_cfg()
    valid = _skewed_spans(spark).unionByName(
        spark.createDataFrame(
            [(None, 0, "text", "orphan span", None, 0)],
            "doc_id string, seq int, kind string, text string,"
            " media_ref string, offset int",
        )
    )
    plain = sorted(
        map(tuple, P.span_sequence_df(valid).collect()),
        key=lambda t: (t[0] or "", t[1]),
    )
    salted = sorted(
        map(tuple, P.span_sequence_skew_df(valid, cfg).collect()),
        key=lambda t: (t[0] or "", t[1]),
    )
    assert plain == salted
    assert any(t[0] is None for t in salted)


def test_salt_buckets_one_degrades_to_single_window(spark):
    """cfg.salt_buckets=1 is a legal config: one chunk IS the single
    window, so the skew path must short-circuit instead of crashing on
    percentile_approx([])."""
    from pdf_parser_spark.operators import pages as P

    cfg = _low_threshold_cfg(threshold=500, buckets=1)
    valid = _skewed_spans(spark)
    plain = sorted(map(tuple, P.span_sequence_df(valid).collect()))
    salted = sorted(
        map(tuple, P.span_sequence_skew_df(valid, cfg).collect())
    )
    assert plain == salted


def test_mega_doc_w2_empty_branch_on_healthy_corpus(spark):
    """With no doc past the threshold the skew path equals the plain
    path (mega branch empty) — the run_pipeline default is safe."""
    from pdf_parser_spark.operators import pages as P

    valid = _skewed_spans(spark, mega_spans=30)
    cfg = _low_threshold_cfg(threshold=500)
    assert P.mega_doc_ids(valid, cfg).count() == 0
    plain = sorted(map(tuple, P.span_sequence_df(valid).collect()))
    salted = sorted(
        map(tuple, P.span_sequence_skew_df(valid, cfg).collect())
    )
    assert plain == salted


def test_salted_join_rejects_outer_and_semi(spark):
    """The salt-replicated right side breaks right/full-outer and
    semi/anti semantics; the helper must refuse them loudly."""
    import pytest

    big = spark.range(10).withColumnRenamed("id", "k")
    dim = spark.range(3).withColumnRenamed("id", "k")
    for bad in ("right", "full", "outer", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_equi_join"):
            K.salted_equi_join(big, dim, "k", "k", n_salts=4, how=bad)


def test_mega_doc_detection_from_pre_explode_docs(spark):
    """docs= routes mega detection through the map-only size(spans)
    filter (zero shuffle — run_pipeline's default); output must stay
    bit-identical to the single-window plan, and the detection must
    route the mega doc even when some of its spans would be
    quarantined (size counts them — over-routing is physical only)."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.operators import pages as P

    valid = _skewed_spans(spark)
    docs = valid.groupBy("doc_id").agg(
        F.collect_list(
            F.struct("kind", "text", "media_ref", "offset")
        ).alias("spans")
    )
    cfg = _low_threshold_cfg()
    plain = sorted(map(tuple, P.span_sequence_df(valid).collect()))
    salted = sorted(
        map(
            tuple,
            P.span_sequence_skew_df(valid, cfg, docs=docs).collect(),
        )
    )
    assert plain == salted
