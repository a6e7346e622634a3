"""Per-partition lineage + resumable execution (north rule: "checkpoints
per-partition progress to a lineage/metrics table so a killed job resumes
without reprocessing completed partitions").

Model (SURVEY.md §2.9):
- documents are assigned a deterministic ``bucket`` (0..n_buckets-1) from
  md5(doc_id) — stable across runs and cluster sizes;
- buckets are processed in WAVES (``wave_size`` buckets per Spark job);
- each wave: write outputs partitioned by bucket (dynamic partition
  overwrite → idempotent re-write), THEN append one lineage row per bucket
  with ``observe()``-collected counters;
- resume = anti-join the bucket list against completed lineage rows: a
  wave killed before its lineage append is simply re-run, and its partial
  output partitions are overwritten (Iceberg ``overwritePartitions``
  or parquet dynamic overwrite — the sources/tables seam; lineage rows
  and outputs alike take ``iceberg:`` table refs or filesystem paths).

At 1000 executors the wave is the unit of checkpoint granularity and each
wave is one fully-parallel job — the driver loop is O(n_buckets /
wave_size) metadata operations, never per-document work.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from pdf_parser_spark.config import DEFAULT_CONFIG, PipelineConfig
from pdf_parser_spark.pipeline import run_pipeline
from pdf_parser_spark.sources.tables import (
    read_table,
    sub_ref,
    table_exists,
    write_table,
)

LINEAGE_SUBDIR = "_lineage"
# The dedup runner records STAGE ordinals, not bucket ids, as
# partition_id; its lineage lives in its own namespace so pointing both
# runners at one out_dir can never alias stage rows with bucket rows.
DEDUP_LINEAGE_SUBDIR = "_lineage_dedup"


def with_bucket(docs: DataFrame, n_buckets: int) -> DataFrame:
    """Deterministic doc bucket: first 8 hex chars of md5(doc_id) mod N
    (portable, stable under repartitioning — never spark_partition_id)."""
    b = F.conv(F.substring(F.md5("doc_id"), 1, 8), 16, 10).cast(
        "long"
    ) % n_buckets
    return docs.withColumn("bucket", b.cast("int"))


def completed_buckets(
    spark: SparkSession, out_dir: str, subdir: str = LINEAGE_SUBDIR
) -> set:
    """Read the lineage table (``iceberg:`` ref or parquet dir — the
    sources/tables seam) and return the done bucket ids."""
    ref = sub_ref(out_dir, subdir)
    if not table_exists(spark, ref):
        return set()
    rows = (
        read_table(spark, ref)
        .filter(F.col("status") == "done")
        .select("partition_id")
        .distinct()
        .collect()
    )
    return {r.partition_id for r in rows}


def _append_lineage(
    spark: SparkSession,
    out_dir: str,
    rows: list,
    subdir: str = LINEAGE_SUBDIR,
) -> None:
    from pdf_parser_spark.schemas import LINEAGE

    df = spark.createDataFrame(rows, LINEAGE)
    write_table(
        df.coalesce(1), sub_ref(out_dir, subdir), mode="append"
    )


def run_resumable(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str = "run-0",
    n_buckets: int = 16,
    wave_size: int = 8,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    fail_after_waves: int | None = None,
    normalize_html: bool = False,
) -> dict:
    """Process all pending buckets; return a summary.

    ``fail_after_waves`` is a fault-injection hook for the resume test —
    raises after k completed waves, exactly as a mid-job kill would.
    """
    bucketed = with_bucket(docs, n_buckets)
    done = completed_buckets(spark, out_dir)
    pending = [b for b in range(n_buckets) if b not in done]
    waves = [
        pending[i : i + wave_size]
        for i in range(0, len(pending), wave_size)
    ]

    processed = []
    for wi, wave in enumerate(waves):
        if fail_after_waves is not None and wi >= fail_after_waves:
            raise RuntimeError(
                f"injected failure before wave {wi} (buckets {wave})"
            )
        started = time.time()
        wave_docs = bucketed.filter(F.col("bucket").isin(wave))
        obs = Observation(f"wave-{wi}")
        wave_docs = wave_docs.observe(
            obs,
            F.count("*").alias("docs"),
            F.sum(F.size(F.coalesce("spans", F.array()))).alias("spans"),
        )

        result = run_pipeline(
            wave_docs.drop("bucket"), cfg, normalize_html=normalize_html
        )
        out = result.spans_out.join(
            bucketed.select("doc_id", "bucket"), "doc_id"
        )
        # 1) idempotent output write (re-running a bucket overwrites only
        # that bucket's partitions: Iceberg overwritePartitions / parquet
        # dynamic partition overwrite, via the sources/tables seam)
        write_table(
            out,
            sub_ref(out_dir, "spans_out"),
            mode="overwrite_partitions",
            partition_by=("bucket",),
        )
        write_table(
            result.sections.join(
                bucketed.select("doc_id", "bucket"), "doc_id"
            ),
            sub_ref(out_dir, "sections"),
            mode="overwrite_partitions",
            partition_by=("bucket",),
        )
        result.unpersist()

        # 2) lineage append AFTER the output commit
        got = obs.get
        finished = time.time()
        import datetime as _dt

        rows = [
            (
                run_id,
                int(b),
                "done",
                int(got.get("docs") or 0),
                int(got.get("spans") or 0),
                _dt.datetime.fromtimestamp(started, _dt.timezone.utc)
                .replace(tzinfo=None),
                _dt.datetime.fromtimestamp(finished, _dt.timezone.utc)
                .replace(tzinfo=None),
                {"wave": float(wi)},
            )
            for b in wave
        ]
        _append_lineage(spark, out_dir, rows)
        processed.extend(wave)

    return {
        "run_id": run_id,
        "skipped_buckets": sorted(done),
        "processed_buckets": processed,
        "n_waves": len(waves),
    }


def run_resumable_dedup(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    run_id: str = "dedup-0",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    k: int = 3,
    n_bands: int = 4,
    fail_after_stages: int | None = None,
) -> dict:
    """Resumable MinHash-LSH near-dup job: the expensive signatures
    fold and the band-bucket pair join are separate DURABLE stages —
    each writes its stage table (the ``dedup.stage_table_materializer``
    seam) and then appends a lineage row (partition_id = stage
    ordinal), so a job killed between the two resumes WITHOUT
    recomputing the ceil(n_hashes/4)-md5-per-shingle signature pass.

    ``fail_after_stages`` injects a crash after k committed stages,
    exactly as a mid-job kill would.  Returns a summary dict; the
    candidate pairs land in ``<out_dir>/pairs``.
    """
    import datetime as _dt

    from pdf_parser_spark.functions import dedup as dd

    sig_ref = sub_ref(out_dir, "signatures")
    done = completed_buckets(spark, out_dir, DEDUP_LINEAGE_SUBDIR)

    def _stage_row(stage: int, n_rows: int, t0: float) -> tuple:
        return (
            run_id,
            stage,
            "done",
            n_rows,
            0,
            _dt.datetime.fromtimestamp(t0, _dt.timezone.utc)
            .replace(tzinfo=None),
            _dt.datetime.fromtimestamp(time.time(), _dt.timezone.utc)
            .replace(tzinfo=None),
            {"stage": float(stage)},
        )

    skipped = []
    # --- stage 0: signatures (the md5 fold — never recompute) --------
    if 0 in done:
        sigs = read_table(spark, sig_ref)
        skipped.append(0)
    else:
        if fail_after_stages is not None and fail_after_stages < 1:
            raise RuntimeError("injected failure before stage 0")
        t0 = time.time()
        sigs = dd.stage_table_materializer(out_dir, "signatures")(
            dd.minhash_df(docs, id_col, text_col, n_hashes, k)
        )
        _append_lineage(
            spark, out_dir, [_stage_row(0, sigs.count(), t0)],
            DEDUP_LINEAGE_SUBDIR,
        )

    # --- stage 1: band-bucket candidate pairs -------------------------
    if 1 in done:
        skipped.append(1)
    else:
        if fail_after_stages is not None and fail_after_stages < 2:
            raise RuntimeError("injected failure before stage 1")
        t0 = time.time()
        rows = n_hashes // n_bands
        banded = sigs.select(
            "id",
            F.posexplode(
                dd.lsh_bands(F.col("sig"), n_bands, rows)
            ).alias("band_idx", "band_key"),
        )
        pairs = (
            banded.alias("l")
            .join(
                banded.alias("r"),
                (F.col("l.band_idx") == F.col("r.band_idx"))
                & (F.col("l.band_key") == F.col("r.band_key"))
                & (F.col("l.id") < F.col("r.id")),
            )
            .select(
                F.col("l.id").alias("id_a"),
                F.col("r.id").alias("id_b"),
            )
            .distinct()
        )
        write_table(pairs, sub_ref(out_dir, "pairs"), mode="overwrite")
        n_pairs = read_table(spark, sub_ref(out_dir, "pairs")).count()
        _append_lineage(
            spark, out_dir, [_stage_row(1, n_pairs, t0)],
            DEDUP_LINEAGE_SUBDIR,
        )

    return {
        "run_id": run_id,
        "skipped_stages": skipped,
        "pairs_ref": sub_ref(out_dir, "pairs"),
    }
