"""Per-stage wall-clock profile of the 5-step pipeline at local[2].

local[2] is the stable profiling config on this box (±7% run-to-run vs
±20-30% at local[32] — BENCH/README.md): use it to ATTRIBUTE cost, not
to report throughput.  Prints one line per stage (each stage is forced
with the same eager materialization the pipeline itself uses, so the
split reflects what run_pipeline executes).

Usage: python tools/pipeline_profile.py [n_docs]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 40_000
    from pyspark.storagelevel import StorageLevel

    from pdf_parser_spark.session import get_spark
    from pdf_parser_spark.operators import metadata as metadata_op
    from pdf_parser_spark.operators import metrics as metrics_op
    from pdf_parser_spark.operators import pages as pages_op
    from pdf_parser_spark.operators import sections as sections_op
    from pdf_parser_spark.operators import toc as toc_op
    from pdf_parser_spark.pipeline import read_documents
    import bench as bench_mod  # reuses the cached bench corpus

    spark = get_spark(
        master="local[2]",
        shuffle_partitions=32,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    corpus_path = bench_mod.ensure_corpus(spark, n_docs, 20_000)
    docs = read_documents(spark, corpus_path)
    # REAL warm scan: a bare count() is answered from parquet footers
    # and warms nothing — the first stage would then absorb the cold
    # read and mis-attribute it.  Touch the span payload columns so the
    # OS page cache holds the column chunks the stages actually read.
    from pyspark.sql import functions as F

    t0 = time.time()
    docs.agg(
        F.sum(F.length(F.array_join(
            F.transform("spans", lambda s: F.coalesce(s["text"], F.lit(""))),
            "",
        )))
    ).collect()
    print(f"{'(warm scan)':14s} {time.time() - t0:7.2f}s", flush=True)

    t = {}

    def stamp(name, t0):
        t[name] = time.time() - t0
        print(f"{name:14s} {t[name]:7.2f}s", flush=True)

    t0 = time.time()
    flat = pages_op.explode_spans(docs)
    valid = pages_op.valid_spans(flat)
    pages = pages_op.pages_df(valid).persist(StorageLevel.MEMORY_AND_DISK)
    pages.count()
    stamp("pages", t0)

    t0 = time.time()
    spans_out = pages_op.span_sequence_df(valid)
    spans_out.agg({"order": "max"}).collect()
    stamp("spans_out", t0)

    t0 = time.time()
    metadata = metadata_op.metadata_df(docs, pages).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    metadata.count()
    stamp("metadata", t0)

    t0 = time.time()
    toc = toc_op.toc_entries_df(pages, metadata, persist=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    toc.count()
    stamp("toc", t0)

    t0 = time.time()
    sections = sections_op.sections_df(
        pages, toc, metadata, persist=True
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sections.count()
    stamp("sections", t0)

    t0 = time.time()
    metrics = metrics_op.metrics_df(docs, pages, toc, sections, metadata)
    metrics.count()
    stamp("metrics", t0)

    total = sum(t.values())
    print(f"{'TOTAL':14s} {total:7.2f}s")
    for k, v in sorted(t.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {100 * v / total:5.1f}%")


if __name__ == "__main__":
    main()
