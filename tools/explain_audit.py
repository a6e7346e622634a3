"""Physical-plan audit: print `.explain("formatted")` for the key
operators and grep the properties that matter at 100 TB:

- PushedFilters / ReadSchema on parquet scans (pushdown + pruning)
- BroadcastHashJoin where a side is a small dim
- Exchange count (shuffles) per pipeline stage
- WholeStageCodegen spans vs ArrowEvalPython / FlatMapGroupsInPandas

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from pdf_parser_spark import driver_queries as dq  # noqa: E402
from pdf_parser_spark.session import get_spark  # noqa: E402


def summarize(name: str, df) -> None:
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    exchanges = len(re.findall(r"\bExchange\b", plan))
    bhj = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    bnl = len(re.findall(r"BroadcastNestedLoopJoin", plan))
    codegen = len(re.findall(r"WholeStageCodegen", plan))
    arrow = len(re.findall(r"ArrowEvalPython|FlatMapGroupsInPandas|"
                           r"MapInPandas", plan))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    pushed = [p for p in pushed if p.strip()]
    print(
        f"{name:28s} exch={exchanges:2d} bhj={bhj} smj={smj} bnl={bnl} "
        f"codegen={codegen:2d} pyStages={arrow} "
        f"pushed={'Y' if pushed else '-'}"
    )
    if "-v" in sys.argv:
        print(plan)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[8]", shuffle_partitions=8)

    qs = dq.queries()
    for name in [
        "f1_page_prune",
        "a1_tpch_pricing_summary",
        "j1_broadcast_dim_join",
        "j2_range_join",
        "j3_anti_join",
        "w5_topk_per_group",
        "dedup_lsh_pairs",
        "sim_cosine_topk",
        "text_token_counts",
        "pipeline_span_sequence",
    ]:
        summarize(name, qs[name](spark, sf_dir))

    # pipeline stages over fixture input
    from pdf_parser_spark.fixtures.gen import fixture_corpus, to_spark_df
    from pdf_parser_spark.operators import metadata as M
    from pdf_parser_spark.operators import pages as P
    from pdf_parser_spark.operators import sections as S
    from pdf_parser_spark.operators import toc as T

    docs = to_spark_df(spark, fixture_corpus(n_docs=6))
    valid = P.valid_spans(P.explode_spans(docs))
    pages = P.pages_df(valid)
    meta = M.metadata_df(docs, pages)
    summarize("stage:span_sequence", P.span_sequence_df(valid))
    summarize("stage:pages", pages)
    summarize("stage:metadata", meta)
    toc = T.toc_entries_df(pages, meta, persist=False)
    summarize("stage:toc", toc)
    summarize("stage:sections", S.sections_df(pages, toc, meta,
                                              persist=False))


if __name__ == "__main__":
    main()
