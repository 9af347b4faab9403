"""Local stand-in for the driver's correctness gate: runs every
__spark_entry__ query and compares row count + sorted values against
the DuckDB oracle.

Usage: python scripts/check_contract.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
                if v == -0.0:
                    v = 0.0
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from weak_supervision_for_ner_spark.config import get_spark

    spark = get_spark("contract-check", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod._TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows ({time.time()-t0:.1f}s) [no oracle]")
            continue
        try:
            res = con.sql(oracles[name])
            o_cols = res.columns
            o_rows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {exc}")
            continue
        if sorted(cols) != sorted(o_cols):
            failures.append(name)
            print(f"FAIL  {name}: columns {sorted(cols)} != {sorted(o_cols)}")
            continue
        a = normalize(rows, cols)
        b = normalize(o_rows, o_cols)
        if len(a) != len(b):
            print(f"FAIL  {name}: {len(a)} spark rows vs {len(b)} oracle rows")
            failures.append(name)
        elif a != b:
            diff = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
            print(f"FAIL  {name}: value mismatch at sorted rows {diff}")
            for i in diff[:2]:
                print(f"      spark : {a[i]}")
                print(f"      oracle: {b[i]}")
            failures.append(name)
        else:
            print(f"ok    {name}: {len(a)} rows match ({time.time()-t0:.1f}s)")
    print("\n%d/%d failed" % (len(failures), len([q for q in queries if not only or q in only])))
    if failures:
        print("failures:", failures)
        sys.exit(1)


if __name__ == "__main__":
    main()
