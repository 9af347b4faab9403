"""Format-pluggable table sinks (SURVEY.md §1.3).

The north-rule production target is an Iceberg TABLE
(``writeTo(...).overwritePartitions()``); this sandbox has no Iceberg
runtime, so every sink in the engine writes through this seam instead
of hard-coding ``.parquet()``: ``fmt="parquet"`` is the
fully-functional fallback (same partitioning layout), ``fmt="iceberg"``
targets a catalog table when one is configured and fails with an
actionable message when not.

Layout contract shared by both formats:
- a salted ``repartition(buckets, xxhash64(bucket_col))`` ahead of the
  write spreads hot keys (hot-domain url skew, SURVEY.md §4) so no
  writer task owns a mega-partition;
- ``partition_by`` columns become directory partitions (parquet) or
  identity partition fields (Iceberg) — pred for the graph, source for
  mentions — giving consumers partition pruning either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

FORMATS = ("parquet", "iceberg")


def write_table(
    df: DataFrame,
    target: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    bucket_col: str | None = None,
    buckets: int = 32,
) -> None:
    """Write ``df`` to ``target`` — a filesystem path (parquet) or a
    catalog table name (iceberg) — overwriting previous contents.

    Iceberg path: ``overwritePartitions`` when the table already exists
    (the idempotent re-run shape: only partitions present in ``df`` are
    replaced), ``create`` with identity partitioning otherwise.
    """
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}, got {fmt!r}")
    if bucket_col is not None:
        df = df.repartition(buckets, F.xxhash64(bucket_col))

    if fmt == "parquet":
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        return

    try:
        if df.sparkSession.catalog.tableExists(target):
            df.writeTo(target).overwritePartitions()
        else:
            writer = df.writeTo(target)
            if partition_by:
                writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
            writer.create()
    except Exception as exc:  # noqa: BLE001 — surface the likely cause
        raise RuntimeError(
            f"iceberg write to {target!r} failed — this Spark session "
            "needs an Iceberg catalog (spark.sql.catalog.<name> = "
            "org.apache.iceberg.spark.SparkCatalog and the iceberg-spark-"
            "runtime jar on the classpath); use fmt='parquet' for the "
            f"filesystem fallback. Underlying error: {exc}"
        ) from exc
