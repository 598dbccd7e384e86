"""On-disk table layout: the Cassandra keyspace re-expressed as
partitioned parquet.

The reference keys every table on ``(device_id, interface_id, ...)``
so each write/read touches one Cassandra partition
(``queries.ex:44-58,108,137-141``). The lakehouse equivalent keeps the
same locality through directory partitioning + in-file ordering:

- partition columns ``(realm, bucket)`` where ``bucket =
  pmod(xxhash64(device_id), N_BUCKETS)`` — bounded directory count
  (a raw ``device_id`` partition would create millions of tiny dirs
  at 100 TB), realm isolation for multi-tenant pruning, and any
  device-scoped read prunes to 1/N of the data before the scan.
- files sorted by ``(device_id, interface, path, reception_timestamp)``
  so per-device slices are contiguous (parquet row-group statistics
  then prune within the file the way Cassandra clustering keys do).

Writes are append-only; the two non-append semantics of the reference
are expressed as idempotent compaction jobs over the log:

- property LWW + unset (``queries.ex:87-155``): latest row per key
  wins, delete markers drop the key — ``compact_properties``.
- TTL expiry (``queries.ex:299-306``, ``impl.ex:527-533``): rows carry
  ``expires_at``; readers filter it, ``vacuum_expired`` rewrites
  storage without dead rows (the Cassandra background GC made
  explicit).

No Delta/Iceberg dependency: the layout only assumes parquet +
directory listing, so the same code runs on any Spark cluster; on a
lakehouse the compactions become MERGE INTO statements with identical
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: Directory-partition fan-out for device-keyed tables. 64 buckets x
#: realms keeps listings cheap; at 100 TB each bucket holds ~1.5 TB
#: which AQE splits into ordinary tasks.
N_BUCKETS = 64


def device_bucket(device_id: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable device -> bucket assignment (the consistent-hash queue
    routing of amqp_data_consumer/supervisor.ex:41-49, made a column)."""
    return F.pmod(F.xxhash64(device_id), F.lit(n_buckets)).cast("int")


def write_device_table(
    df: DataFrame,
    path: str,
    *,
    order: tuple[str, ...] = ("device_id", "interface", "path", "reception_timestamp"),
    mode: str = "append",
    n_buckets: int = N_BUCKETS,
) -> None:
    """Append rows to a device-keyed table with the standard layout.

    One shuffle (repartition on the partition columns) so each task
    writes exactly one directory partition; rows are sorted inside
    each file for row-group pruning on device/path slices.
    """
    (
        df.withColumn("bucket", device_bucket(F.col("device_id"), n_buckets))
        .repartition("realm", "bucket")
        .sortWithinPartitions(*order)
        .write.partitionBy("realm", "bucket")
        .mode(mode)
        .parquet(path)
    )


def read_device_table(
    spark: SparkSession,
    path: str,
    *,
    realm: str | None = None,
    device_id: str | None = None,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Read with partition pruning: realm and device filters hit the
    directory level (bucket is derived from device_id, so a point read
    scans a single (realm, bucket) directory)."""
    df = spark.read.parquet(path)
    if realm is not None:
        df = df.filter(F.col("realm") == realm)
    if device_id is not None:
        df = df.filter(
            (F.col("bucket") == device_bucket(F.lit(device_id), n_buckets))
            & (F.col("device_id") == device_id)
        )
    return df


PROPERTY_KEY = ("realm", "device_id", "interface", "path")


def compact_properties(log: DataFrame, key: tuple[str, ...] = PROPERTY_KEY) -> DataFrame:
    """Fold the property write log into its LWW state.

    Input rows carry ``reception_timestamp`` and an ``is_delete`` flag
    (unset markers, queries.ex:87-119). Latest row per key wins; keys
    whose latest row is a delete disappear — exactly Cassandra's
    last-write-wins + tombstone semantics, as one window, re-runnable
    (idempotent MERGE equivalent).
    """
    w = Window.partitionBy(*key).orderBy(
        F.col("reception_timestamp").desc(), F.col("is_delete").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (~F.coalesce("is_delete", F.lit(False))))
        .drop("rn", "is_delete")
    )


def live_view(df: DataFrame, now: Column) -> DataFrame:
    """TTL read filter (queries.ex:774-817): rows with no expiry or a
    future expiry. ``now`` is an explicit column/literal so batch jobs
    are reproducible (no wall-clock in the plan)."""
    return df.filter(F.col("expires_at").isNull() | (F.col("expires_at") > now))


def vacuum_expired(
    spark: SparkSession, path: str, now: Column, out_path: str
) -> None:
    """Rewrite a table without expired rows — the explicit form of
    Cassandra's TTL garbage collection. Runs as a partition-parallel
    scan+filter+write; on a lakehouse this is DELETE WHERE."""
    df = spark.read.parquet(path)
    live = live_view(df, now)
    (
        live.write.partitionBy("realm", "bucket")
        .mode("overwrite")
        .parquet(out_path)
    )
