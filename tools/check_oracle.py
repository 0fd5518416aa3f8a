"""Local replica of the driver's correctness gate: run each
queries() entry and its oracle_sql() side-by-side at a given sf and
compare row count + sorted-column schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            # normalize lists to tuples for sorting/compare
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    ok = True
    if len(ray_df) != len(sql_df):
        print(f"  [{name}] ROWS mismatch: ray={len(ray_df)} sql={len(sql_df)}")
        ok = False
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        print(
            f"  [{name}] SCHEMA mismatch:\n    ray={sorted(ray_df.columns)}\n"
            f"    sql={sorted(sql_df.columns)}"
        )
        return False
    a, b = canon(ray_df), canon(sql_df)
    # The driver's value hash is type-sensitive: int64 2 vs float64 2.0
    # hash differently even though the tolerant compare below passes.
    for col in a.columns:
        ka, kb = a[col].dtype.kind, b[col].dtype.kind
        if {ka, kb} <= {"i", "u", "f"} and ka != kb:
            print(
                f"  [{name}] DTYPE-KIND mismatch col {col}: "
                f"ray={a[col].dtype} sql={b[col].dtype} (driver hash would differ)"
            )
            ok = False
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False,
                                      rtol=1e-9, atol=1e-9)
    except AssertionError as e:
        print(f"  [{name}] VALUES mismatch: {str(e).splitlines()[-1]}")
        for col in a.columns:
            try:
                pd.testing.assert_series_equal(
                    a[col], b[col], check_dtype=False, check_exact=False,
                    rtol=1e-9, atol=1e-9)
            except AssertionError:
                diff_idx = None
                for i in range(min(len(a), len(b))):
                    if a[col].iloc[i] != b[col].iloc[i] and not (
                        pd.isna(a[col].iloc[i]) and pd.isna(b[col].iloc[i])
                    ):
                        diff_idx = i
                        break
                if diff_idx is not None:
                    print(
                        f"    col {col} first diff @{diff_idx}: "
                        f"ray={a[col].iloc[diff_idx]!r} sql={b[col].iloc[diff_idx]!r}"
                    )
        ok = False
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[{name}] RAY ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"[{name}] rows-only: {len(ray_df)} rows ({t1-t0:.1f}s)")
            n_ok += 1
            continue
        try:
            sql_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"[{name}] SQL ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if compare(name, ray_df, sql_df):
            print(f"[{name}] OK ({len(ray_df)} rows, ray {t1-t0:.1f}s)")
            n_ok += 1
        else:
            n_fail += 1
    print(f"\n{n_ok} ok, {n_fail} failed")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
