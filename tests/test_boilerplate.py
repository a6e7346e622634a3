"""HTML boilerplate stripping: tokenizer ownership rules, density
classification, neighbor smoothing, and plan shape."""

from pyspark.sql import functions as F

from pdf_parser_spark.functions import boilerplate as bp

LONG = " ".join(f"word{i}" for i in range(15))  # 15 words, no links

PAGE = f"""<html><head><title>My Site</title></head><body>
<nav><a href="/">Home</a> <a href="/x">X</a></nav>
<div class="wrap">
<p>{LONG}</p>
<p>short trailing note</p>
</div>
<footer><a href="/t">Terms</a></footer>
</body></html>"""


def _blocks(spark, html):
    df = spark.createDataFrame([("d1", html)], ["doc_id", "html"])
    return bp.parse_html_blocks(df).orderBy("block_id").collect()


def test_tokenizer_innermost_ownership_and_order(spark):
    rows = _blocks(spark, PAGE)
    tags = [r.tag for r in rows]
    # head's direct data is blank → dropped; title owns its text; the
    # wrapper div owns only whitespace → dropped; paragraphs in order
    assert tags == ["title", "nav", "p", "p", "footer"]
    assert rows[0].text == "My Site"
    assert rows[2].text == LONG
    assert rows[3].text == "short trailing note"
    # anchor text accrues to link_len of the owning block
    assert rows[1].link_len == len("Home") + len("X")
    assert rows[2].link_len == 0


def test_tokenizer_tolerates_misnesting(spark):
    rows = _blocks(spark, "<div><p>alpha beta</div></p><p>gamma</p>")
    assert [(r.tag, r.text) for r in rows] == [
        ("p", "alpha beta"),
        ("p", "gamma"),
    ]


def test_classification_rules(spark):
    df = spark.createDataFrame([("d1", PAGE)], ["doc_id", "html"])
    cls = bp.classify_blocks(
        bp.score_blocks(bp.parse_html_blocks(df))
    ).orderBy("block_id")
    got = {r.tag + ":" + r.text[:10]: r.is_content for r in cls.collect()}
    assert got["title:My Site"] is False        # chrome tag
    assert got["nav:Home X"] is False           # chrome + link density
    assert got["p:word0 word"] is True          # long low-link block
    assert got["p:short trai"] is True          # rescued by neighbor


def test_short_block_without_good_neighbor_is_dropped(spark):
    html = "<body><p>tiny note</p></body>"
    df = spark.createDataFrame([("d1", html)], ["doc_id", "html"])
    assert bp.main_content_df(df).count() == 0


def test_link_density_kills_linky_paragraph(spark):
    linky = (
        "<p>" + " ".join(f'<a href="/{i}">link{i}</a>' for i in range(12))
        + "</p>"
    )
    html = f"<body><p>{LONG}</p>{linky}</body>"
    df = spark.createDataFrame([("d1", html)], ["doc_id", "html"])
    out = bp.main_content_df(df).head()
    assert out.main_text == LONG


def test_main_content_order_and_single_python_stage(spark):
    df = spark.createDataFrame(
        [("d1", PAGE), ("d2", f"<body><p>{LONG}</p><p>{LONG}</p></body>")],
        ["doc_id", "html"],
    )
    out = bp.main_content_df(df)
    # plan BEFORE execution: post-run AQE rendering appends the initial
    # plan and would double-count nodes
    plan = out._jdf.queryExecution().executedPlan().toString()
    # exactly one Python crossing: the tokenizer; scoring/classification/
    # assembly stay JVM-side
    assert plan.count("MapInPandas") == 1
    assert "BatchEvalPython" not in plan
    rows = {r.doc_id: r.main_text for r in out.collect()}
    assert rows["d1"] == LONG + "\nshort trailing note"
    assert rows["d2"] == LONG + "\n" + LONG
