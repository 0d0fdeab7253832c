"""Local stand-in for the driver's correctness gate: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB over the same parquet, compare row count + column names +
order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb
import pandas as pd


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"columns {sorted(got.columns)} != {sorted(exp.columns)}")
        return problems
    if len(got) != len(exp):
        problems.append(f"rows {len(got)} != {len(exp)}")
    g, e = normalize(got), normalize(exp)
    if len(g) == len(e):
        for c in g.columns:
            if g[c].dtype.kind == "f" or e[c].dtype.kind == "f":
                import numpy as np

                ga = g[c].to_numpy(dtype=float)
                ea = e[c].to_numpy(dtype=float)
                bad = ~(
                    (pd.isna(ga) & pd.isna(ea)) | (ga == ea)
                )
                if bad.any():
                    i = int(np.nonzero(bad)[0][0])
                    problems.append(
                        f"col {c}: {int(bad.sum())} value diffs, first at row "
                        f"{i}: {ga[i]!r} != {ea[i]!r}"
                    )
            else:
                bad = ~(g[c].eq(e[c]) | (g[c].isna() & e[c].isna()))
                if bad.any():
                    i = int(bad.idxmax())
                    problems.append(
                        f"col {c}: {int(bad.sum())} value diffs, first at row "
                        f"{i}: {g[c][i]!r} != {e[c][i]!r}"
                    )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as ent
    from overmatch_spark.session import get_spark

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duck_connection(sf_dir)

    print("== entry() smoke (sf0.001) ==")
    t = time.time()
    edf = ent.entry(spark)
    n = edf.count()
    print(f"entry rows={n} schema={[f.name for f in edf.schema.fields]} "
          f"({time.time()-t:.1f}s)")
    assert n >= 0

    qs = ent.queries()
    oracles = ent.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t = time.time()
        got = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows ({t_spark:.1f}s)")
            continue
        t = time.time()
        exp = con.execute(oracles[name]).fetchdf()
        t_duck = time.time() - t
        problems = compare(name, got, exp)
        status = "OK " if not problems else "FAIL"
        print(
            f"[{status}] {name}: spark={len(got)} duck={len(exp)} rows "
            f"(spark {t_spark:.1f}s, duck {t_duck:.1f}s)"
        )
        for p in problems:
            failures += 1
            print(f"       {p}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
