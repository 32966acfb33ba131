"""Bucketed storage — pre-shuffled tables for exchange-free hot-path joins.

At 100 TB the dominant *recurring* cost of the matching workflow is not the
match itself (name-scale: millions of distinct strings) but joining the
resulting groups table back to the record-scale table — the reference's
``merge_dfs`` (match_data.py:700-741) — and re-running that join every time
the grouping is revised. Bucketing persists the hash-partitioned layout:
``bucketBy(n, key)`` + ``sortBy(key)`` at write time means every later
equi-join or aggregation on the key reuses the stored distribution instead of
re-shuffling the record-scale table.

Spark mechanics encoded here (and asserted by tests/test_plans.py):

- a join of two tables bucketed on the join key with the SAME bucket count
  compiles to a sort-merge join with NO Exchange on either side
  (``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` additionally covers
  exact-multiple counts);
- a groupBy on the bucket key aggregates in place — no Exchange before the
  final aggregate;
- bucket layout is catalog metadata (session catalog here; Hive metastore or
  Iceberg in production — Iceberg expresses the same thing as a
  ``bucket(n, key)`` hidden-partition transform), so plain
  ``.parquet(path)`` writes cannot carry it: these sinks go through
  ``saveAsTable``. Pass ``path=`` to keep the data files in an external
  location while the catalog holds only the layout.

Choosing ``n_buckets`` at scale: target bucket files of 128-512 MB after
compression — e.g. ~100 TB of records at 256 MB/bucket-file per partition
needs O(10^4) buckets; bucket counts should be fixed per subject area so
every producer/consumer pair agrees (same count ⇒ co-located).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nama_spark.operators.matchdata import MatchData


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "string",
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed by ``bucket_col`` into the catalog.

    ``sort_cols`` default to ``[bucket_col]`` — with one file per bucket the
    scan also reports the sort order, so downstream sort-merge joins skip
    their Sort. ``path`` makes the table external (catalog = layout only)."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(*(sort_cols or [bucket_col]))
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_matchdata_bucketed(
    md: MatchData,
    table: str,
    n_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a MatchData's (string, count, group) bucketed by ``string`` —
    the layout every ``merge_dfs`` / ``assign_records`` join consumes. Write
    the record-scale table with the same bucket count on its name column and
    the group-assignment join is exchange-free on BOTH sides."""
    write_bucketed(
        md.df, table, bucket_col="string", n_buckets=n_buckets, path=path, mode=mode
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucketed layout rides along in the scan node
    (``SELECT * FROM t`` would lose nothing either; this exists for symmetry
    and so callers never string-format table names into SQL)."""
    return spark.read.table(table)
