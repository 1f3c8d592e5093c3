"""Storage-layout operators: partitioned writes and bucketed tables.

The reference's only sink is a single CSV overwritten daily
(src/etl.py:220-222); at 100 TB the sink layout IS the query plan for
every downstream reader:

- **Hive-partitioned parquet** (`write_partitioned`): a filter on the
  partition column becomes directory pruning — the scan never opens
  non-matching files. `.explain` shows it as `PartitionFilters`, and
  "partition count" drops before any I/O happens.
- **Bucketed tables** (`write_bucketed`): pre-shuffling both sides of
  a recurring join into the same bucket layout makes the join
  exchange-free forever after — each task zips bucket i ⋈ bucket i.
  The write pays the shuffle ONCE; every subsequent join/aggregation
  on the bucket key pays none. That trade is the backbone of any
  repeatedly-joined 100 TB fact/dim layout.

Partition-column cardinality discipline: partition by low-cardinality
columns users filter on (date, type, region); bucket by the
high-cardinality join keys. Inverting that (partitioning by a
high-cardinality key) creates millions of tiny files — the classic
small-files failure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet write (one dir level per col)."""
    df.write.partitionBy(*partition_cols).mode(mode).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) table.

    Sorting within buckets lets a sort-merge join skip its sort step
    too (the read is already sorted per bucket). The table is written
    external at ``path`` (default: a /tmp scratch location) so a
    leftover directory from an earlier session can't collide with the
    managed-table location check; DROP TABLE first makes the write
    idempotent within a session.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    w = df.write.bucketBy(num_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w = w.option("path", path or f"/tmp/spark_graft_bucketed/{table}")
    w.mode("overwrite").format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    left_key: str,
    right_key: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket keys.

    When both tables are bucketed on their respective join key with
    the same bucket count, the physical plan contains NO Exchange for
    this join (verified in tests/test_sinks.py) — bucket i reads
    straight into the task that joins it.
    """
    left = spark.table(left_table)
    right = spark.table(right_table)
    rk = right_key or left_key
    return left.join(right, left[left_key] == right[rk], how=how)
