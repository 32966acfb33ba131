"""Ingestion — the reference's read_csv/from_df surface, Spark-first.

- ``read_csv``      → match_data.py:825-864 (all columns forced to string,
  na_filter=False ⇒ empty strings, not NULLs).
- ``read_matchdata`` → format detection per match_data.py:757-774 on any
  DataFrame (csv/parquet/table), delegating to MatchData.detect.
- ``read_records``  → the north-rule input table. The production path is an
  Iceberg catalog table (``spark.read.table("catalog.db.repo_files")``); the
  sandbox has no Iceberg runtime jar, so parquet paths exercise the identical
  code (SURVEY.md §1.6).
- ``write_matchdata`` → to_csv/to_df serialization (match_data.py:580-627).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nama_spark.operators.matchdata import MatchData


def read_csv(
    spark: SparkSession,
    path: str,
    match_format: str = "detect",
    **options,
) -> MatchData:
    """CSV → MatchData. All columns are read as string, NULLs become empty
    strings (pandas na_filter=False parity, match_data.py:860-861)."""
    df = spark.read.csv(path, header=True, **options)
    df = df.select(
        *[F.coalesce(F.col(c).cast("string"), F.lit("")).alias(c) for c in df.columns]
    )
    if "count" in df.columns:
        # counts came in as strings; unparseable/empty → 1 (ANSI-safe)
        df = df.withColumn(
            "count",
            F.coalesce(F.col("count").try_cast("long"), F.lit(1)),
        )
    return _dispatch(df, match_format)


def read_matchdata(df: DataFrame, match_format: str = "detect") -> MatchData:
    return _dispatch(df, match_format)


def _dispatch(df: DataFrame, match_format: str) -> MatchData:
    if match_format == "detect":
        return MatchData.detect(df)
    if match_format == "unmatched":
        return MatchData.from_unmatched(
            df, count_col="count" if "count" in df.columns else None
        )
    if match_format == "groups":
        return MatchData.from_groups(
            df, count_col="count" if "count" in df.columns else None
        )
    if match_format == "pairs":
        return MatchData.from_pairs(df)
    raise ValueError(f"unknown match_format: {match_format}")


def read_records(spark: SparkSession, source: str, catalog: str | None = None) -> DataFrame:
    """North-rule input: an Iceberg/catalog table name or a parquet path.

    ``catalog`` pins the table to a named Spark catalog —
    ``spark.read.table(f"{catalog}.{source}")`` — the production Iceberg path
    (SURVEY.md §1.6): register the catalog on the submit line with
    ``--packages org.apache.iceberg:iceberg-spark-runtime-*`` plus
    ``spark.sql.catalog.<name>`` confs (exact invocation in
    jobs/run_pipeline.py's docstring), then pass ``--catalog <name>
    --input db.repo_files``. Catalog reads get Iceberg's partition pruning,
    hidden-partition transforms and snapshot isolation for free through the
    same DataFrame plan.

    Without ``catalog``: paths (contain '/' or end in .parquet) read as
    parquet; bare names resolve in the session catalog."""
    if catalog:
        return spark.read.table(f"{catalog}.{source}")
    if "/" in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.read.table(source)


def write_matchdata(
    md: MatchData,
    path: str,
    fmt: str = "parquet",
    singletons: bool = True,
    sort_groups: bool = False,
) -> None:
    out = md.to_df(singletons=singletons, sort_groups=sort_groups)
    if fmt == "parquet":
        out.write.mode("overwrite").parquet(path)
    elif fmt == "csv":
        out.write.mode("overwrite").option("header", True).csv(path)
    else:
        raise ValueError(f"unknown format: {fmt}")
