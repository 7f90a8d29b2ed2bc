"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and, where an
oracle_sql() entry exists, the oracle on DuckDB over the same parquet
views; compares row count, column names, and order-insensitive values.

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from knowledge_graph_spark.session import get_spark  # noqa: E402
from knowledge_graph_spark.synth import TABLES  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check-entry")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(sdf):6d} rows  ({t_spark:.1f}s)")
            if len(sdf) == 0:
                failures.append((name, "zero rows (rows-only check)"))
            continue
        t0 = time.time()
        odf = con.execute(oracles[name]).fetchdf()
        t_duck = time.time() - t0
        status, detail = "OK", ""
        if sorted(sdf.columns) != sorted(odf.columns):
            status, detail = "SCHEMA-MISMATCH", f"spark={sorted(sdf.columns)} duck={sorted(odf.columns)}"
        elif len(sdf) != len(odf):
            status, detail = "ROWCOUNT-MISMATCH", f"spark={len(sdf)} duck={len(odf)}"
        else:
            a, b = normalize(sdf), normalize(odf)
            if not a.equals(b):
                neq = (a != b).any(axis=1)
                diff_idx = list(a.index[neq])[:3]
                status = "VALUE-MISMATCH"
                detail = f"{int(neq.sum())} differing rows; first:\n"
                for i in diff_idx:
                    detail += f"  spark: {a.loc[i].to_dict()}\n  duck : {b.loc[i].to_dict()}\n"
        print(
            f"  {name:24s} {status:18s} {len(sdf):6d} rows (spark {t_spark:.1f}s, duck {t_duck:.1f}s) {detail[:2000]}"
        )
        if status != "OK":
            failures.append((name, detail[:2000]))
    print(f"\n{'ALL OK' if not failures else f'{len(failures)} FAILURES: {[f[0] for f in failures]}'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
