"""Local replica of the driver's correctness check: run each queries()
entry and its oracle_sql() side-by-side on one sf dir, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_queries.py [--log] [--times] [sf_dir] [query ...]

``--log`` appends a one-line JSON summary of the full pass to
PROGRESS.jsonl (the round-start gate record the judge asked for);
``--times`` prints per-query wall seconds so slow entries stand out.
"""

from __future__ import annotations

import json
import sys
import time

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
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    do_log = "--log" in flags
    do_times = "--times" in flags
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    t_start = time.time()

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
    n_run = 0
    times: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t_q = time.time()
        try:
            check_one(name, fn, oracles, con, sf_dir, failures)
        finally:
            times[name] = time.time() - t_q
            if do_times:
                print(f"       {name}: {times[name]:.2f}s", flush=True)

    wall = time.time() - t_start
    print()
    if do_times and times:
        worst = sorted(times.items(), key=lambda kv: -kv[1])[:15]
        print("slowest:", [(n, round(s, 2)) for n, s in worst])
    if do_log:
        rec = {
            "ts": time.time(), "event": "check_queries_full",
            "sf_dir": sf_dir, "queries": n_run,
            "failures": [n for n, _ in failures], "wall_s": round(wall, 1),
        }
        with open("PROGRESS.jsonl", "a") as fh:
            fh.write(json.dumps(rec) + "\n")
    if failures:
        print("FAILURES:", failures)
        print(f"{n_run} queries in {wall:.1f}s")
        sys.exit(1)
    print(f"all checks passed ({n_run} queries in {wall:.1f}s)")
    ray.shutdown()


def check_one(name, fn, oracles, con, sf_dir, failures):
    try:
        result = fn(sf_dir)
        if hasattr(result, "to_pandas"):
            got = result.to_pandas()
        else:
            got = pd.DataFrame(result)
    except Exception as e:  # noqa: BLE001
        failures.append((name, f"query raised: {e!r}"))
        print(f"[FAIL] {name}: query raised {e!r}")
        return
    if name not in oracles:
        print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
        if len(got) == 0 and name != "per_org_pairs":
            failures.append((name, "0 rows"))
        return
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
        return
    if len(gn) != len(wn):
        failures.append((name, f"rows {len(gn)} != {len(wn)}"))
        print(f"[FAIL] {name}: rows {len(gn)} vs {len(wn)}")
        return
    if not gn.equals(wn):
        diff = (gn != wn) & ~(gn.isna() & wn.isna())
        nbad = int(diff.any(axis=1).sum())
        failures.append((name, f"{nbad} mismatching rows"))
        print(f"[FAIL] {name}: {nbad}/{len(gn)} rows differ")
        bad = diff.any(axis=1)
        print("  ray:", gn[bad].head(3).to_dict("records"))
        print("  sql:", wn[bad].head(3).to_dict("records"))
        return
    print(f"[OK]   {name}: {len(gn)} rows")


if __name__ == "__main__":
    main()
