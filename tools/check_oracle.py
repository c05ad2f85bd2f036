"""Local emulation of the driver's correctness gate: run every queries()
entry at a given sf_dir, run the paired oracle_sql() in DuckDB over the same
parquet views, and compare row count + schema + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data as rd
        if isinstance(res, rd.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("float", "Float")):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith(("int", "Int", "uint", "UInt")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="stable") \
        .reset_index(drop=True)


def main(sf_dir: str):
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    import ray.data as rd
    rd.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_ok = n_bad = 0
    for name, fn in qs.items():
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"ERROR  {name}: query raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ROWS   {name}: {len(got)} rows (no oracle)")
            n_ok += 1
            continue
        try:
            want = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR  {name}: oracle raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL   {name}: columns {list(got.columns)} vs "
                  f"{list(want.columns)}")
            n_bad += 1
            continue
        if len(got) != len(want):
            print(f"FAIL   {name}: rows {len(got)} vs {len(want)}")
            n_bad += 1
            continue
        want2 = want.astype(got.dtypes.to_dict(), errors="ignore")
        eq = got.equals(want2)
        if not eq:
            diff = (got != want2).any(axis=1)
            print(f"FAIL   {name}: {int(diff.sum())}/{len(got)} rows differ; "
                  f"first:\n{got[diff].head(2)}\nvs\n{want2[diff].head(2)}")
            n_bad += 1
        else:
            print(f"OK     {name}: {len(got)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    ray.shutdown()
    return n_bad


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    raise SystemExit(main(sf))
