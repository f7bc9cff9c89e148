"""Self-check: run every queries() entry and compare against oracle_sql()
via DuckDB, mimicking the driver's row-count + schema + order-insensitive
value comparison. Usage: python tools/check_oracles.py [sf_dir] [names...]"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWS ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(np.asarray(av).dtype, np.floating):
            if not np.array_equal(np.round(av, 9), np.round(bv, 9)):
                bad = np.flatnonzero(np.round(av, 9) != np.round(bv, 9))[:3]
                return f"VALUES col={c} rows={bad.tolist()} ray={av[bad]} sql={bv[bad]}"
        else:
            if not np.array_equal(av, bv):
                bad = np.flatnonzero(av != bv)[:3]
                return f"VALUES col={c} rows={bad.tolist()} ray={av[bad]} sql={bv[bad]}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from ppagerank_ray import tune_data_context

    tune_data_context()

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    con = duckdb.connect()
    # spill to /tmp, never the repo cwd (the sf0.1 near-dup oracles are
    # quadratic and can balloon DuckDB's temp storage past 80 GB)
    con.sql("SET temp_directory='/tmp/duckdb_oracle_tmp'")
    for tbl in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"{name:24s} RAY-ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        t1 = time.time()
        if name not in sqls:
            print(f"{name:24s} rows-only  n={len(ray_df)}  ray={t1-t0:.1f}s")
            continue
        try:
            sql_df = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"{name:24s} SQL-ERROR {type(e).__name__}: {str(e)[:120]}")
            failures += 1
            continue
        t2 = time.time()
        verdict = compare(name, ray_df, sql_df)
        status = "ok" if verdict == "OK" else "FAIL"
        print(
            f"{name:24s} {status:4s} n={len(ray_df):6d}  ray={t1-t0:.1f}s sql={t2-t1:.1f}s"
            + ("" if verdict == "OK" else f"  {verdict}")
        )
        if verdict != "OK":
            failures += 1
    print("FAILURES:", failures)
    return failures


if __name__ == "__main__":
    raise SystemExit(1 if main() else 0)
