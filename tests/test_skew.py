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


def test_salted_join_rejects_outer_and_semi(spark):
    """The salt-replicated right side breaks right/full-outer and
    semi/anti semantics; the helper must refuse them loudly."""
    import pytest

    big = spark.range(10).withColumnRenamed("id", "k")
    dim = spark.range(3).withColumnRenamed("id", "k")
    for bad in ("right", "full", "outer", "left_semi", "left_anti"):
        with pytest.raises(ValueError, match="salted_equi_join"):
            K.salted_equi_join(big, dim, "k", "k", n_salts=4, how=bad)
