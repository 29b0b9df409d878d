"""Local mirror of the driver's correctness gate: run every queries()
entry against its oracle_sql() via DuckDB at a given sf dir and compare
row-count + schema(column names) + order-insensitive values.

Usage: python scripts/check_contract.py [sf_dir] [query_name ...]
(with query names given, only those queries run and entry() is skipped)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from parser_rdf_spark.session import build_session  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df_pandas):
    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        rows.append(tuple("<NULL>" if v is None or (isinstance(v, float) and v != v) else str(v) for v in tup))
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session(master=os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[8]"))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"FAIL  {name}: spark error {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spd)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            continue
        try:
            opd = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            print(f"FAIL  {name}: oracle error {e}")
            continue
        problems = []
        if len(spd) != len(opd):
            problems.append(f"row count {len(spd)} != {len(opd)}")
        if sorted(spd.columns) != sorted(opd.columns):
            problems.append(f"schema {sorted(spd.columns)} != {sorted(opd.columns)}")
        else:
            a, b = normalize(spd), normalize(opd)
            if a != b:
                diff_a = [r for r in a if r not in b][:3]
                diff_b = [r for r in b if r not in a][:3]
                problems.append(f"values differ; spark-only={diff_a} oracle-only={diff_b}")
        if problems:
            failures.append((name, "; ".join(problems)))
            print(f"FAIL  {name}: {'; '.join(problems)}")
        else:
            print(f"OK    {name}: {len(spd)} rows [{time.time()-t0:.1f}s]")

    if only:
        spark.stop()
        if failures:
            print(f"\n{len(failures)} FAILURES")
            return 1
        print("\nALL OK (filtered)")
        return 0

    print()
    t0 = time.time()
    try:
        res = entrymod.entry(spark)
        n = res.count()
        print(f"entry(): {n} rows, schema={res.schema.simpleString()} [{time.time()-t0:.1f}s]")
    except Exception as e:  # noqa: BLE001 — entry failure must not eat the summary
        failures.append(("entry()", str(e)[:200]))
        print(f"FAIL  entry(): {str(e)[:200]}")

    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        return 1
    print("\nALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
