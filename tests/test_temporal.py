"""As-of join (operators/temporal.py) vs hand-computed pandas
merge_asof semantics."""

import pytest
from pyspark.sql import functions as F

from nama_spark.operators.temporal import asof_join


def _fixture(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (1, 8.0, "early"),
         (2, 5.0, "c"), (3, 7.0, "lonely")],
        ["u", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 8.0, 100.0), (1, 15.0, 200.0), (1, 20.0, 250.0),
         (2, 99.0, 300.0)],
        ["u", "ts", "px"],
    )
    return left, right


def test_asof_backward(spark):
    left, right = _fixture(spark)
    out = {
        (r["u"], r["ts"]): (r["ts_r"], r["px_r"])
        for r in asof_join(left, right, on="ts", by="u").collect()
    }
    assert out[(1, 10.0)] == (8.0, 100.0)
    assert out[(1, 20.0)] == (20.0, 250.0)   # equal ts matches (≤)
    assert out[(1, 8.0)] == (8.0, 100.0)
    assert out[(2, 5.0)] == (None, None)     # right is later only
    assert out[(3, 7.0)] == (None, None)     # no right rows for key
    assert len(out) == 5                     # every left row kept


def test_asof_forward_and_tolerance(spark):
    left, right = _fixture(spark)
    fwd = {
        (r["u"], r["ts"]): (r["ts_r"], r["px_r"])
        for r in asof_join(
            left, right, on="ts", by="u", direction="forward"
        ).collect()
    }
    assert fwd[(1, 10.0)] == (15.0, 200.0)
    assert fwd[(1, 20.0)] == (20.0, 250.0)
    assert fwd[(2, 5.0)] == (99.0, 300.0)
    assert fwd[(3, 7.0)] == (None, None)

    tol = {
        (r["u"], r["ts"]): r["px_r"]
        for r in asof_join(
            left, right, on="ts", by="u", tolerance_sec=2.5
        ).collect()
    }
    assert tol[(1, 10.0)] == 100.0           # gap 2 ≤ 2.5
    assert tol[(1, 8.0)] == 100.0            # gap 0
    # backward match for (1, 20.0) is same-ts → still in tolerance
    assert tol[(1, 20.0)] == 250.0
    assert tol[(2, 5.0)] is None

    with pytest.raises(ValueError):
        asof_join(left, right, by=None)
    with pytest.raises(ValueError):
        asof_join(left, right, by="u", direction="nearest")


def test_asof_matches_pandas(spark):
    """Property check vs pandas.merge_asof on a random-ish grid."""
    import pandas as pd

    lrows = [(u, float(t)) for u in (1, 2, 3) for t in range(0, 50, 7)]
    rrows = [(u, float(t), u * 1000.0 + t)
             for u in (1, 2) for t in range(3, 50, 11)]
    left = spark.createDataFrame(lrows, ["u", "ts"])
    right = spark.createDataFrame(rrows, ["u", "ts", "px"])
    got = {
        (r["u"], r["ts"]): r["px_r"]
        for r in asof_join(left, right, on="ts", by="u").collect()
    }
    lp = pd.DataFrame(lrows, columns=["u", "ts"]).sort_values("ts")
    rp = pd.DataFrame(rrows, columns=["u", "ts", "px"]).sort_values("ts")
    exp = pd.merge_asof(lp, rp, on="ts", by="u", direction="backward")
    for row in exp.itertuples():
        e = None if pd.isna(row.px) else row.px
        assert got[(row.u, row.ts)] == e


def test_interval_join(spark):
    from nama_spark.operators.temporal import interval_join

    points = spark.createDataFrame(
        [(1, 10.0), (1, 3600.0), (1, 7199.0), (2, 50.0), (3, 99.0)],
        ["u", "ts"],
    )
    intervals = spark.createDataFrame(
        [(1, 0.0, 3600.0, "a"),        # [0, 3600): catches 10, not 3600
         (1, 3500.0, 7200.0, "b"),     # overlaps: catches 3600, 7199
         (2, 40.0, 60.0, "c"),
         (9, 0.0, 1e6, "never")],      # other key
        ["u", "start", "end", "name"],
    )
    got = {
        (r["u"], r["ts"], r["name_i"])
        for r in interval_join(
            points, intervals, on="ts", by="u", bucket_sec=1000
        ).collect()
    }
    assert got == {
        (1, 10.0, "a"),
        (1, 3600.0, "b"),
        (1, 7199.0, "b"),
        (2, 50.0, "c"),
    }
    # start inclusive / end exclusive
    assert (1, 3600.0, "a") not in got
    # python O(n^2) oracle agreement on the same fixture, keyless variant
    allp = [(r["u"], r["ts"]) for r in points.collect()]
    alli = [(r["u"], r["start"], r["end"], r["name"])
            for r in intervals.collect()]
    exp = {(u, t, n) for (u, t) in allp
           for (iu, s, e, n) in alli if s <= t < e}
    keyless = {
        (r["u"], r["ts"], r["name_i"])
        for r in interval_join(
            points, intervals.drop("u").withColumnRenamed("name", "name"),
            on="ts", bucket_sec=500,
        ).collect()
    }
    exp_keyless = {(u, t, n) for (u, t) in allp
                   for (_iu, s, e, n) in alli if s <= t < e}
    assert keyless == exp_keyless
    assert {(u, t, n) for (u, t, n) in got} == {
        (u, t, n) for (u, t, n) in exp if any(
            iu == u for (iu, s, e, n2) in alli if n2 == n and s <= t < e)
    }
