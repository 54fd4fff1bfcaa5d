"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given sf dir, runs the matching
``oracle_sql()`` in DuckDB over the same parquet tables, and compares
row count + column names + order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype in (np.dtype("int32"), np.dtype("uint64")):
            df[c] = df[c].astype("int64")
        if df[c].dtype == np.dtype("float32"):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH: ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH: ray={len(a)} sql={len(b)}"
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        ncell = int(diff.to_numpy().sum())
        rows = diff.any(axis=1)
        ex = pd.concat(
            [a[rows].head(3).add_suffix("_ray"), b[rows].head(3).add_suffix("_sql")],
            axis=1,
        )
        return f"VALUE MISMATCH ({ncell} cells):\n{ex.to_string()}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # the oracle SQL constants are BOUND to the driver's sf0.01 gate
    # corpus (kmeans init ids, grid_120 fixture, simhash token stats);
    # comparing at any other sf would yield silent value mismatches
    # that look like engine bugs — refuse instead.
    sys.path.insert(0, "/root/repo")
    from tools.check_window import check as _check_window

    _check_window()  # window-contract guard (VERDICT r4 #3)

    from geodata_ray.pipelines import queries as _q

    if sf_dir.rstrip("/") != _q._ORACLE_SF_DIR:
        sys.exit(
            f"check_correctness: oracle SQL targets {_q._ORACLE_SF_DIR} "
            f"(the driver gate corpus); got {sf_dir}.  Run benches at "
            f"other sfs with bench.py, not this gate."
        )

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=8,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"{name:35s} RAY ERROR: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"{name:35s} rows-only: {len(ray_df)} rows")
            continue
        try:
            sql_df = con.execute(sqls[name]).df()
        except Exception as ex:
            print(f"{name:35s} SQL ERROR: {ex}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:35s} {verdict if verdict != 'OK' else f'OK ({len(ray_df)} rows)'}")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
