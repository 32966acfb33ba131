"""Time-series joins Spark's DataFrame API lacks natively.

As-of joins are the standard event-enrichment primitive (attach the
latest sensor reading / price / click to every downstream event). Spark
has no ASOF JOIN operator, and the naive realization — a range-predicate
join plus a per-left-row argmax — degenerates to a broadcast nested-loop
or an exploded range join. This module uses the union + keyed
carry-forward window instead: ONE hash shuffle on (by, on), one ordered
window per key, no range enumeration, no Exchange SinglePartition.

At 100 TB the shuffle is the same one any keyed window pays; skewed keys
(one hot user) are bounded by that key's own event count, and AQE's
skew-split applies to the exchange. The `by` key is REQUIRED — an
unkeyed global as-of would be a single-partition window; range-bucket
the time axis first if you genuinely need one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | None = None,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right.on ≤ left.on`` (``direction='backward'``; ``'forward'``
    attaches the smallest ``right.on ≥ left.on``) within the same
    ``by`` key — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics,
    left rows always kept. ``tolerance_sec`` voids matches farther than
    that many seconds from the left timestamp (the pandas knob).

    Right rows should be unique per (by, on): with duplicates, which
    one wins depends on their relative order inside the window frame —
    pre-aggregate the right side (one groupBy) to make the join
    deterministic, exactly as pandas requires sorted unique keys.

    All right columns except ``by``/``on`` come back suffixed; the
    right timestamp itself arrives as ``on + suffix``."""
    if by is None:
        raise ValueError(
            "asof_join requires a `by` key: an unkeyed as-of is a "
            "single-partition window — range-bucket the time axis first"
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")

    payload_cols = [c for c in right.columns if c not in (by, on)]
    rpay = F.struct(
        F.col(on).alias(on + suffix),
        *[F.col(c).alias(c + suffix) for c in payload_cols],
    )
    r2 = right.select(
        F.col(by), F.col(on), rpay.alias("__rpay"), F.lit(0).alias("__side")
    )
    l2 = left.withColumn("__side", F.lit(1)).withColumn(
        "__rpay", F.lit(None).cast(r2.schema["__rpay"].dataType)
    )
    u = l2.unionByName(r2, allowMissingColumns=True)

    if direction == "backward":
        # right rows (side 0) sort BEFORE left rows at equal ts → a
        # same-timestamp right row matches (the ≤ in the contract)
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(by)
            .orderBy(F.col(on).desc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    carried = F.last("__rpay", ignorenulls=True).over(w)
    out = (
        u.withColumn("__carried", carried)
        .where(F.col("__side") == 1)
        .drop("__side", "__rpay")
    )
    match = F.col("__carried")
    if tolerance_sec is not None:
        gap = F.abs(
            F.col(on).cast("double")
            - F.col(f"__carried.{on}{suffix}").cast("double")
        )
        match = F.when(gap <= float(tolerance_sec), match)
    out = out.withColumn("__carried", match)
    return out.select(
        *[c for c in left.columns],
        F.col(f"__carried.{on}{suffix}").alias(on + suffix),
        *[
            F.col(f"__carried.{c}{suffix}").alias(c + suffix)
            for c in payload_cols
        ],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | None = None,
    bucket_sec: int = 3600,
    suffix: str = "_i",
) -> DataFrame:
    """Point-in-interval (range) join without a CartesianProduct: both
    sides key on coarse time buckets — each interval explodes into the
    buckets it covers, points carry their single bucket — equi-join on
    (by?, bucket), then the exact ``start ≤ on < end`` filter. Inner
    semantics; a point inside k overlapping intervals yields k rows.

    A point's one bucket meets at most one exploded row per interval,
    so no post-join dedup is needed. Work per interval is
    ``duration/bucket_sec`` exploded rows — size ``bucket_sec`` so
    typical intervals cover O(1) buckets; the join is then a plain hash
    equi-join any executor count shards (with AQE handling residual
    hot buckets), never a nested loop."""
    b = float(bucket_sec)
    pb = points.withColumn(
        "__bucket", F.floor(F.col(on).cast("double") / b).cast("long")
    )
    ib = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("double") / b).cast("long"),
                # end is exclusive, but an interval ending exactly on a
                # bucket edge still owns no point there; ceil-1 == floor
                # for interior ends — sequence over inclusive floors is
                # correct either way
                F.floor(F.col(end_col).cast("double") / b).cast("long"),
            )
        ),
    )
    ipay = [c for c in intervals.columns if c != by]
    ib = ib.select(
        *([F.col(by)] if by else []),
        "__bucket",
        *[F.col(c).alias(c + suffix) for c in ipay],
    )
    keys = ([by] if by else []) + ["__bucket"]
    return (
        pb.join(ib, keys)
        .where(
            (F.col(start_col + suffix) <= F.col(on))
            & (F.col(on) < F.col(end_col + suffix))
        )
        .drop("__bucket")
    )
