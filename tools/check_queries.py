"""Local replica of the driver's correctness check: run each queries()
entry and its oracle_sql() side-by-side on one sf dir, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype({c: "string" for c in df.columns})
    return (
        df.sort_values(list(df.columns)).reset_index(drop=True)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            result = fn(sf_dir)
            if hasattr(result, "to_pandas"):
                got = result.to_pandas()
            else:
                got = pd.DataFrame(result)
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"query raised: {e!r}"))
            print(f"[FAIL] {name}: query raised {e!r}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            if len(got) == 0 and name != "per_org_pairs":
                failures.append((name, "0 rows"))
            continue
        want = con.sql(oracles[name]).df()
        # dtype comparison before string-normalization (driver checks schema)
        gd = {c: str(got[c].dtype) for c in sorted(got.columns)}
        wd = {c: str(want[c].dtype) for c in sorted(want.columns)}
        if gd != wd:
            print(f"[DTYPE] {name}: ray={gd} sql={wd}")
        gn, wn = normalize(got), normalize(want)
        if list(gn.columns) != list(wn.columns):
            failures.append((name, f"cols {list(gn.columns)} != {list(wn.columns)}"))
            print(f"[FAIL] {name}: columns {list(gn.columns)} vs {list(wn.columns)}")
            continue
        if len(gn) != len(wn):
            failures.append((name, f"rows {len(gn)} != {len(wn)}"))
            print(f"[FAIL] {name}: rows {len(gn)} vs {len(wn)}")
            continue
        if not gn.equals(wn):
            diff = (gn != wn) & ~(gn.isna() & wn.isna())
            nbad = int(diff.any(axis=1).sum())
            failures.append((name, f"{nbad} mismatching rows"))
            print(f"[FAIL] {name}: {nbad}/{len(gn)} rows differ")
            bad = diff.any(axis=1)
            print("  ray:", gn[bad].head(3).to_dict("records"))
            print("  sql:", wn[bad].head(3).to_dict("records"))
            continue
        print(f"[OK]   {name}: {len(gn)} rows")

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")
    ray.shutdown()


if __name__ == "__main__":
    main()
