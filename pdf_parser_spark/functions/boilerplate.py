"""HTML boilerplate stripping — DOM text-density / link-density
main-content extraction (north rule: "HTML boilerplate strip ...
DOM heuristics").

The reference repo is PDF-only; this operator covers the HTML half of
the interleaved corpus with the published block-classification approach
of Boilerpipe (Kohlschütter et al., WSDM 2010) and jusText (Pomikálek,
2011), re-expressed Spark-first:

1. ``parse_html_blocks`` — the ONE Python crossing: an Arrow-batched
   ``mapInPandas`` tokenizer over stdlib ``html.parser`` that flattens a
   document's DOM into block rows ``(doc_id, block_id, tag, text,
   raw_len, link_len)``.  Text belongs to the innermost open block
   element; anchor text also accrues to ``link_len``.
2. ``score_blocks`` — native exprs: word count, link density
   (``link_len / raw_len``).
3. ``classify_blocks`` — native jusText-style rules + one-step context
   smoothing via ``lag``/``lead`` windows over ``(doc_id, block_id)``:
   - structural tags (script/style/head/title/nav/footer...) and
     high-link-density blocks (≥ 1/3) are boilerplate;
   - long low-link blocks (≥ 10 words) are content;
   - short low-link blocks inherit "content" when an adjacent block is
     long-content (the jusText neighborhood rule), else boilerplate.
4. ``main_content_df`` — per-doc ordered concat of content blocks via
   ``array_sort(collect_list(...))`` — one shuffle on ``doc_id``, no
   global sort.

Scale: blocks shuffle on ``doc_id`` only; the smoothing windows are
per-doc and bounded by DOM size, so a 10^12-doc corpus partitions
cleanly; mega-page skew is the same (doc_id, block) spread used by span
reassembly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOCK_TAGS = {
    "p", "div", "section", "article", "aside", "nav", "footer", "header",
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th", "ul", "ol",
    "table", "tr", "blockquote", "pre", "title", "head", "script",
    "style", "main", "figure", "figcaption",
}

#: blocks whose tag alone marks them boilerplate (chrome / non-content)
CHROME_TAGS = ("script", "style", "head", "title", "nav", "footer",
               "header", "aside")

BLOCKS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("block_id", IntegerType()),
        StructField("tag", StringType()),
        StructField("text", StringType()),
        StructField("raw_len", LongType()),
        StructField("link_len", LongType()),
    ]
)

LINK_DENSITY_MAX = 1.0 / 3.0
LONG_BLOCK_WORDS = 10


def _parse_one(html: str):
    """Flatten one HTML string into block dicts (innermost-block text
    ownership, start-tag emission order)."""
    from html.parser import HTMLParser

    blocks: list = []
    stack: list = []
    link_depth = 0

    class _P(HTMLParser):
        def handle_starttag(self, tag, attrs):
            nonlocal link_depth
            if tag == "a":
                link_depth += 1
            if tag in BLOCK_TAGS:
                b = {"tag": tag, "parts": [], "link_len": 0}
                blocks.append(b)
                stack.append(b)

        def handle_endtag(self, tag):
            nonlocal link_depth
            if tag == "a":
                link_depth = max(0, link_depth - 1)
            if tag in BLOCK_TAGS:
                # pop to the matching open block (tolerates mis-nesting)
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i]["tag"] == tag:
                        del stack[i:]
                        break

        def handle_data(self, data):
            if stack and data:
                stack[-1]["parts"].append(data)
                if link_depth:
                    stack[-1]["link_len"] += len(data)

    _P().feed(html or "")
    out = []
    for b in blocks:
        raw = "".join(b["parts"])
        text = " ".join(raw.split())
        if text:
            out.append(
                (b["tag"], text, len(raw), b["link_len"])
            )
    return out


def parse_html_blocks(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(doc_id, html) → block rows.  One Arrow-batched Python stage; all
    downstream scoring/classification is JVM-native."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, html in zip(pdf[id_col], pdf[html_col]):
                for bid, (tag, text, raw_len, link_len) in enumerate(
                    _parse_one(html)
                ):
                    rows.append(
                        (str(doc_id), bid, tag, text, raw_len, link_len)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "block_id", "tag", "text", "raw_len",
                    "link_len",
                ],
            )

    return docs.select(id_col, html_col).mapInPandas(
        batches, BLOCKS_SCHEMA
    )


def _n_words(text: Column) -> Column:
    return F.size(F.split(F.trim(text), r"\s+", -1))


def score_blocks(blocks: DataFrame) -> DataFrame:
    """Native density features per block."""
    return blocks.select(
        "*",
        _n_words(F.col("text")).alias("n_words"),
        (
            F.col("link_len").cast("double")
            / F.greatest(F.col("raw_len"), F.lit(1)).cast("double")
        ).alias("link_density"),
    )


def classify_blocks(scored: DataFrame) -> DataFrame:
    """jusText-style classification + one-step neighbor smoothing, all
    window exprs over (doc_id, block_id)."""
    chrome = F.col("tag").isin(*CHROME_TAGS)
    linky = F.col("link_density") >= LINK_DENSITY_MAX
    long_good = (
        ~chrome & ~linky & (F.col("n_words") >= LONG_BLOCK_WORDS)
    )
    short_candidate = (
        ~chrome & ~linky & (F.col("n_words") < LONG_BLOCK_WORDS)
    )
    w = Window.partitionBy("doc_id").orderBy("block_id")
    with_flags = scored.withColumn("long_good", long_good)
    neighbor_good = (
        F.coalesce(F.lag("long_good").over(w), F.lit(False))
        | F.coalesce(F.lead("long_good").over(w), F.lit(False))
    )
    return with_flags.withColumn(
        "is_content",
        F.col("long_good") | (short_candidate & neighbor_good),
    )


def main_content_df(
    docs: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """(doc_id, html) → (doc_id, main_text): content blocks joined with
    newlines in DOM order."""
    classified = classify_blocks(
        score_blocks(parse_html_blocks(docs, id_col, html_col))
    )
    kept = classified.filter(F.col("is_content"))
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("block_id"), F.col("text"))
                    )
                ),
                lambda s: s["text"],
            ),
            "\n",
        ).alias("main_text")
    )
