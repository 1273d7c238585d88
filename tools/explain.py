"""Plan + stats inspector for any queries() entry: the per-stage
feedback loop the perf workflow needs (which operator dominates wall
time, what shuffles, how many blocks/rows per stage).

Usage: python tools/explain.py <query> [sf_dir]

Executes the query once at the given scale (default sf0.001 — this is
an inspector, not a benchmark) and prints:

- the logical plan (``Dataset.__repr__`` chain, pre-execution),
- ``ds.stats()`` — per-operator wall time, blocks, rows, memory,
  and the all-to-all exchanges,
- the output row count and schema.

Results that are already driver-side (pandas/pyarrow from a
worker-side finish) print shape+dtypes only.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    if name not in qs:
        close = [k for k in qs if name.lower() in k.lower()]
        print(f"unknown query {name!r}; close matches: {close}",
              file=sys.stderr)
        return 2

    try:
        res = qs[name](sf_dir)
        if hasattr(res, "stats"):  # a Dataset
            print("=== logical plan ===")
            print(repr(res))
            mat = res.materialize()
            print("\n=== stats ===")
            print(mat.stats())
            print("=== output ===")
            print(f"rows: {mat.count()}")
            print(f"schema: {mat.schema()}")
        else:  # worker-side finish already landed on the driver
            print("=== driver-side result (no Dataset plan) ===")
            print(f"type: {type(res).__name__}")
            print(getattr(res, "shape", None) or f"len {len(res)}")
            print(getattr(res, "dtypes", getattr(res, "schema", "")))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
