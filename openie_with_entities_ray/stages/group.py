"""Grouped per-sentence dedup + top-k (A1/A3) for detached inputs.

The fused flagship path never needs this (splits stay row-co-located in
stages/extract.py). This stage exists for the staged pipeline and for
inputs that arrive already split and shuffled (the reference's
``--split_fp`` pre-split file mode, /root/reference/run.py:206-227): a
hash-partition ``groupby`` on the original-sentence identity, then a
per-group kernel that sorts by (split_id, depth) — Ray gives no arrival-
order guarantee, and the reference's dedup is first-wins in encounter
order (model.py:595-634) — before exact dedup and stable top-k
(metric.py:435-438).
"""

from __future__ import annotations

import pandas as pd

from ..functions.triples import Triple, dedup_exact, top_k

GROUP_KEY = ["repo", "path", "commit", "sent_id"]


def _dedup_topk_group(group: pd.DataFrame, num_extractions: int) -> pd.DataFrame:
    group = group.sort_values(["split_id", "depth"], kind="mergesort")
    triples = [
        Triple(a1, r, a2, c)
        for a1, r, a2, c in zip(
            group["arg1"], group["rel"], group["arg2"], group["confidence"]
        )
    ]
    kept = top_k(dedup_exact(triples), num_extractions)
    keep_keys = []
    seen = set()
    for t in kept:
        seen.add((t.arg1, t.rel, t.arg2, t.confidence))
    mask = [
        (a1, r, a2, c) in seen
        for a1, r, a2, c in zip(
            group["arg1"], group["rel"], group["arg2"], group["confidence"]
        )
    ]
    out = group[mask]
    # a dedup-key survivor may match several rows (same triple from several
    # splits); keep only the first in encounter order per dedup key
    out = out.drop_duplicates(subset=["arg1", "rel", "arg2"], keep="first")
    return out


def dedup_topk_grouped(triples_ds, num_extractions: int = 5):
    """Shuffled variant of the reference's per-sentence accumulator."""
    return triples_ds.groupby(GROUP_KEY).map_groups(
        lambda g: _dedup_topk_group(g, num_extractions), batch_format="pandas"
    )


def merge_prediction_sets(ds_a, ds_b, num_extractions: int = 5):
    """J5 (utils/merge_output_files.py:4-70): union two triple sets, drop
    exact dups per sentence, keep top-k by confidence."""
    return dedup_topk_grouped(ds_a.union(ds_b), num_extractions)
