"""Sinks (SURVEY.md §2a S5-S7).

Reference behaviors re-expressed for a cluster:

- S5 per-character checkpoint CSVs (web_scraper.py:1164-1183) →
  partitioned parquet with dynamic partition overwrite: re-running a slice
  replaces exactly the partitions it recomputed (idempotent resume), which
  is the property the reference's per-char temp CSVs were approximating.
- S6 final CSV sink (web_scraper.py:1262-1284) → header CSV; coalesce(1)
  only by explicit request since a single output file is an anti-pattern
  at scale.
- S7 Postgres append (web_scraper.py:1286-1291) → JDBC append writer,
  gated (no driver in this container) — plus the scale-native alternative:
  run-stamped append parquet, partitioned by run_id so downstream
  "latest run" reads prune to one partition (the fix for the reference's
  append-table regret, reference README.md:71).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_checkpointed(df: DataFrame, path: str, partition_cols=("char_name", "game_version")) -> None:
    """Idempotent per-partition checkpoint sink (reference S5).

    `partitionOverwriteMode=dynamic` means only partitions present in `df`
    are replaced — a re-run of 30 characters rewrites 30 directories, not
    the table — the cluster-grade version of the reference's
    one-CSV-per-character resume scheme.
    """
    (
        df.sparkSession.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    )
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_run_stamped(df: DataFrame, path: str, run_id: str) -> None:
    """Append-mode load with a run dimension (reference S7 + README.md:71).

    Every row gets a `run_id` partition column; readers filter to the
    latest run and Spark prunes all other partitions at the file listing —
    O(one run) reads regardless of history length.
    """
    (
        df.withColumn("run_id", F.lit(run_id))
        .write.mode("append")
        .partitionBy("run_id")
        .parquet(path)
    )


def read_latest_run(spark: SparkSession, path: str) -> DataFrame:
    """Latest-run view over a run-stamped append table (partition-pruned)."""
    runs = spark.read.parquet(path).select("run_id").distinct()
    latest = runs.agg(F.max("run_id").alias("run_id")).collect()[0]["run_id"]
    # equality filter on the partition column ⇒ partition pruning at scan
    return spark.read.parquet(path).where(F.col("run_id") == latest)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Header CSV sink (reference S6).  single_file=True reproduces the
    reference's one-file output for parity; default keeps parallel writers."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("header", True).csv(path)


def write_bucketed(
    df: DataFrame, table: str, bucket_cols: list[str], num_buckets: int = 32
) -> None:
    """Bucketed managed table: pre-shuffles once at WRITE time so every
    subsequent equi-join/aggregation on `bucket_cols` is co-located and
    shuffle-free.  The 100 TB pattern for fact-fact joins read many times
    (pay the shuffle once, not per query); `sortBy` within buckets also
    removes the join's sort.

    Requires saveAsTable (bucket metadata lives in the catalog)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )


def write_jdbc_append(df: DataFrame, url: str, table: str, properties: dict) -> None:
    """JDBC append sink (reference S7, to_sql(if_exists='append')).

    Not exercisable in this container (no JDBC driver jar); the call shape
    is the production path: partition-parallel INSERTs, append mode.
    """
    df.write.mode("append").jdbc(url, table, properties=properties)
