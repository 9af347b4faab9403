"""Dtype-sensitive oracle diff: compares Spark results vs DuckDB
oracles through the pandas path (the driver's likely fetch route),
so HUGEINT->float64 / int64 drift and value drift both surface.

Usage: python scripts/debug_hash.py [query ...]   (default: all with oracles)
"""
from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod  # noqa: E402
from weak_supervision_for_ner_spark.config import get_spark  # noqa: E402


def canon_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), key=lambda s: s.map(repr)).reset_index(drop=True)
    return df


def main():
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark("debug-hash", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in entrymod._TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or [n for n in queries if n in oracles]
    bad = []
    for name in names:
        if name not in oracles:
            print(f"{name}: no oracle, skipped")
            continue
        sdf = canon_df(queries[name](spark, sf_dir).toPandas())
        odf = canon_df(con.sql(oracles[name]).df())
        issues = []
        for c in sdf.columns:
            if c not in odf.columns:
                issues.append(f"column {c} missing in oracle")
                continue
            if str(sdf[c].dtype) != str(odf[c].dtype):
                issues.append(f"dtype {c}: spark {sdf[c].dtype} vs oracle {odf[c].dtype}")
        if len(sdf) != len(odf):
            issues.append(f"rows {len(sdf)} vs {len(odf)}")
        elif list(sdf.columns) == list(odf.columns):
            sa = sdf.astype(object).where(pd.notna(sdf), None)
            oa = odf.astype(object).where(pd.notna(odf), None)
            ndiff = 0
            for i in range(len(sa)):
                ra, rb = tuple(sa.iloc[i]), tuple(oa.iloc[i])
                if repr(ra) != repr(rb):
                    ndiff += 1
                    if ndiff <= 4:
                        issues.append(f"row {i}: spark {ra!r} != oracle {rb!r}")
            if ndiff:
                issues.append(f"{ndiff} value-differing rows")
        status = "OK " if not issues else "BAD"
        if issues:
            bad.append(name)
        print(f"{status} {name}")
        for msg in issues:
            print(f"     {msg}")
    print(f"\n{len(bad)} queries with issues: {bad}")


if __name__ == "__main__":
    main()
