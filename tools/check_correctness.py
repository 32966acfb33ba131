"""Local replica of the driver's correctness gate: run every queries() entry
on Spark at sf0.01 and its oracle_sql() on DuckDB over the same parquet,
compare row count + column names + order-insensitive value multiset.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style: stable string at high precision (we pre-round floats
        # in the queries themselves; this catches residue)
        return f"{v:.9g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_value(x) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)


def rows_to_multiset(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        "|".join(norm_value(r[i]) for i in order) for r in rows
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from nama_spark.session import get_spark

    spark = get_spark("check_correctness", cores=16,
                      extra_conf={"spark.ui.showConsoleProgress": "false"})

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # driver-style dtype probe: DuckDB HUGEINT (sum() of integers)
            # converts to float64 in arrow/pandas and breaks the value hash
            # even when python ints compare equal — flag it here.
            otypes = [d[1] for d in res.description]
            hugeint_cols = [
                c for c, t in zip(ocols, otypes) if str(t).upper().startswith("HUGEINT")
            ]
            if hugeint_cols:
                print(
                    f"WARN  {name}: oracle columns {hugeint_cols} are HUGEINT "
                    f"(cast ::BIGINT or the driver hash will mismatch)"
                )
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(orows)}")
        if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
            problems.append(f"schema spark={scols} duckdb={ocols}")
        if not problems:
            ms = rows_to_multiset(scols, srows)
            mo = rows_to_multiset(ocols, orows)
            if ms != mo:
                diff_s = [x for x in ms if x not in set(mo)][:3]
                diff_o = [x for x in mo if x not in set(ms)][:3]
                problems.append(f"values spark-only={diff_s} duckdb-only={diff_o}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} [{time.time()-t0:.1f}s]")
            n_fail += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rows_only} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
