"""Table-reference layer: Iceberg when the runtime has it, parquet
otherwise.

The north rule's input is "an Iceberg table of interleaved text + media
documents"; this sandbox has no Iceberg runtime jars, so every operator
documents its Iceberg mapping (identity partitioning ≙ ``partitionBy``,
stage tables ≙ cached boundaries) and runs on parquet.  This module is
the concrete seam: a table reference of the form ``iceberg:<catalog.db
.table>`` routes to the Iceberg catalog (``spark.table`` /
``DataFrameWriterV2`` — the V2 path Iceberg requires), anything else is
a filesystem parquet path.  The Iceberg branch is gated on the runtime
actually exposing the catalog plugin, with a clear error when it does
not — no silent parquet fallback for an explicit ``iceberg:`` ask.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"


def is_iceberg_ref(ref: str) -> bool:
    return ref.startswith(ICEBERG_PREFIX)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _require_iceberg(spark: SparkSession, ref: str) -> str:
    if not iceberg_available(spark):
        raise RuntimeError(
            f"table ref {ref!r} requires the Iceberg runtime "
            "(org.apache.iceberg.spark.SparkCatalog not on the "
            "classpath); add the iceberg-spark-runtime jar and a "
            "spark.sql.catalog.<name> config, or pass a parquet path"
        )
    return ref[len(ICEBERG_PREFIX):]


def sub_ref(ref: str, name: str) -> str:
    """Derive a child table reference: ``iceberg:cat.db.t`` + 'lineage' →
    ``iceberg:cat.db.t_lineage`` (sibling table in the same namespace);
    a path gets a subdirectory."""
    clean = name.strip("_/")
    if is_iceberg_ref(ref):
        return f"{ref}_{clean}"
    return f"{ref.rstrip('/')}/{name}"


def table_exists(spark: SparkSession, ref: str) -> bool:
    """Catalog lookup for ``iceberg:`` refs; filesystem check (through
    the Hadoop FS API, so any configured scheme works) for paths."""
    if is_iceberg_ref(ref):
        if not iceberg_available(spark):
            return False
        return spark.catalog.tableExists(ref[len(ICEBERG_PREFIX):])
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(ref)
    return p.getFileSystem(conf).exists(p)


def read_table(spark: SparkSession, ref: str, schema=None) -> DataFrame:
    """``iceberg:<catalog.db.table>`` → catalog read (snapshot-isolated,
    partition pruning from the Iceberg metadata tree); otherwise parquet
    with the pinned schema (no inference pass)."""
    if is_iceberg_ref(ref):
        return spark.table(_require_iceberg(spark, ref))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(ref)


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "overwrite",
    partition_by: tuple = (),
) -> None:
    """``iceberg:`` refs use the V2 writer (``createOrReplace`` /
    ``append`` / ``overwritePartitions`` — Iceberg's atomic-commit
    path); paths write parquet with optional ``partitionBy`` (≙ Iceberg
    identity partitioning).

    ``mode="overwrite_partitions"`` is the idempotent re-run write the
    lineage/ingest checkpointing model needs: only the partitions
    present in ``df`` are replaced (Iceberg ``overwritePartitions()``;
    parquet dynamic partition overwrite via the per-write
    ``partitionOverwriteMode`` option — no session-level conf
    mutation)."""
    if is_iceberg_ref(ref):
        name = _require_iceberg(df.sparkSession, ref)
        writer = df.writeTo(name)
        for col in partition_by:
            writer = writer.partitionedBy(df[col])
        if mode == "append":
            writer.append()
        elif mode == "overwrite_partitions":
            writer.overwritePartitions()
        else:
            writer.createOrReplace()
        return
    if mode == "overwrite_partitions":
        writer = df.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
    else:
        writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(ref)
