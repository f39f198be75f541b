"""Driver-mimic: run each __ray_entry__ query AND its DuckDB oracle at a
given sf, compare row count + column names + values (columns sorted by
name, rows sorted by all columns) — a local preview of CORRECTNESS_r{N}.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd name must not yield a green "0 fail" summary that
        # verified nothing
        sys.exit(f"unknown query name(s): {sorted(unknown)}")
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = normalize(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: "
                  f"{str(e)[:200]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(mine)} rows")
            n_rows_only += 1
            continue
        try:
            ora = normalize(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: "
                  f"{str(e)[:200]}")
            n_fail += 1
            continue
        problems = []
        if len(mine) != len(ora):
            problems.append(f"rowcount {len(mine)} vs {len(ora)}")
        if list(mine.columns) != list(ora.columns):
            problems.append(f"cols {list(mine.columns)} vs "
                            f"{list(ora.columns)}")
        if not problems:
            try:
                pd.testing.assert_frame_equal(
                    mine, ora, check_dtype=False, check_exact=False,
                    rtol=0, atol=0)
            except AssertionError as e:
                problems.append("values: " + str(e).split("\n")[0][:160])
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if "values" in "".join(problems) or "cols" in "".join(problems):
                print("  mine:", mine.head(3).to_dict("records"))
                print("  ora :", ora.head(3).to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    ray.shutdown()


if __name__ == "__main__":
    main()
