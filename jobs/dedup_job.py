"""Cluster job entrypoint: resumable corpus deduplication.

The training-data counterpart of jobs/graph_job.py — runs the dedup
pipeline over a sharded documents table and writes a per-shard,
manifest-tracked verdict table:

    ray job submit --address http://<head>:8265 \
        --working-dir . \
        -- python jobs/dedup_job.py \
           --input '/mnt/data/documents/*.parquet' --out /mnt/out/dedup \
           --method exact|minhash|simhash

Per input shard the job writes ``out/<method>/part=<k>/`` Parquet plus a
manifest; a re-run skips every shard whose manifest exists (pruned at
the read — nothing upstream re-executes). Exact dedup emits
(content_sha256, keeper_id, n_docs) groups; minhash/simhash emit
verified near-dup pairs WITHIN the shard (the production cross-shard
pass runs the same operators over the full table — per-shard mode is
the resumable embarrassingly-parallel first stage that removes the
bulk of duplicates next to the data).
"""

from __future__ import annotations

import argparse
import glob
import json
import sys


def _pipeline(method: str, docs):
    from openie_with_entities_ray.stages.dataops import (
        exact_dedup_groups,
        minhash_candidate_pairs,
        simhash_pairs,
    )

    if method == "exact":
        return exact_dedup_groups(docs)
    if method == "minhash":
        return minhash_candidate_pairs(docs, threshold=0.8)
    if method == "simhash":
        return simhash_pairs(docs, max_hamming=3)
    raise SystemExit(f"unknown --method {method}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="glob of documents parquet shards")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--method", default="exact",
                    choices=["exact", "minhash", "simhash"])
    ap.add_argument("--no-resume", action="store_true")
    args = ap.parse_args(argv)

    import os

    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if "RAY_JOB_ID" in os.environ else "local",
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import ray.data

    from openie_with_entities_ray.stages.graph import (
        completed_partitions,
        write_partition,
    )

    if "://" in args.input:
        print(json.dumps({
            "error": "object-store URIs need a pyarrow.fs listing step; "
                     "pass a local/NFS glob"
        }))
        return 1
    shards = sorted(glob.glob(args.input))
    if not shards:
        print(json.dumps({"error": f"no shards match {args.input}"}))
        return 1

    out_dir = os.path.join(args.out, args.method)
    done = completed_partitions(out_dir) if not args.no_resume else set()
    manifests, skipped = [], []
    for part, shard in enumerate(shards):
        if part in done:
            skipped.append(part)
            continue
        docs = ray.data.read_parquet(shard, columns=["doc_id", "text"])
        result = _pipeline(args.method, docs)
        manifests.append(
            write_partition(result, out_dir, part,
                            extra_meta={"input": str(shard)})
        )
    print(
        json.dumps(
            {
                "method": args.method,
                "shards_total": len(shards),
                "shards_skipped": len(skipped),
                "shards_written": len(manifests),
                "rows_written": sum(m["rows"] for m in manifests),
                "out": out_dir,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
