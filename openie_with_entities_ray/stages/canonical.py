"""Canonicalization shuffle: surface forms → canonical entity IDs.

North-star stage: a groupby-aggregate that clusters argument surface forms
into canonical ids. Surface normalization follows the reference's
predicate/entity normalizer (strip punctuation, lower, collapse spaces —
/root/reference/scripts/pubmed_analysis.py:22-31).

Skew design (north rule "salted keys for skewed popular entities"):
popular surfaces (Zipf heads) are pre-aggregated *inside* ``map_batches``
— each batch emits at most one partial row per distinct surface — so the
all-to-all ``groupby`` moves O(distinct-per-batch) rows, not O(rows);
the hot key's traffic is already combined per-block, which is the salted
two-phase aggregation in its Ray Data form.

Canonical id = sha256 of the normalized surface (content-addressed: no
global counter, no coordination, stable across cluster sizes; sha256 so
the DuckDB oracle can recompute it — DuckDB has no sha1).
"""

from __future__ import annotations

import hashlib
import string
from collections import Counter

import pyarrow as pa

_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def normalize_surface(text: str) -> str:
    """pubmed_analysis.py:23-25: strip punctuation, lower, single spaces."""
    return " ".join(text.translate(_PUNCT_TABLE).lower().split())


def canonical_id(norm_surface: str) -> str:
    return "C" + hashlib.sha256(norm_surface.encode("utf-8")).hexdigest()[:16]


def _partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch combiner: (surface col) → one row per distinct normalized
    surface with its partial count + an example raw surface."""
    counts: Counter = Counter()
    example = {}
    for col in ("arg1", "arg2"):
        if col not in batch.column_names:
            continue
        for v in batch.column(col).to_pylist():
            if not v:
                continue
            norm = normalize_surface(v)
            if not norm:
                continue
            counts[norm] += 1
            # per-batch example = lexicographic MIN raw surface, so the
            # global Min aggregate is the true corpus-wide min regardless
            # of how rows landed in batches (deterministic at any
            # parallelism, and SQL-reproducible as min(arg))
            prev = example.get(norm)
            if prev is None or v < prev:
                example[norm] = v
    norms = list(counts)
    return pa.table(
        {
            "surface_norm": pa.array(norms, pa.string()),
            "surface": pa.array([example[n] for n in norms], pa.string()),
            "n_mentions": pa.array([counts[n] for n in norms], pa.int64()),
        }
    )


def canonicalize_surfaces(triples_ds):
    """triples → nodes table (node_id, surface, n_mentions).

    Two-phase aggregate: map_batches partials (combiner) → small groupby
    sum. The 'surface' kept per canonical id is the lexicographic min of the
    per-batch examples (deterministic under any partitioning).
    """
    from ray.data.aggregate import Min, Sum

    partials = triples_ds.map_batches(_partial_counts, batch_format="pyarrow")
    agg = partials.groupby("surface_norm").aggregate(
        Sum("n_mentions", alias_name="n_mentions"),
        Min("surface", alias_name="surface"),
    )

    def finalize(batch: pa.Table) -> pa.Table:
        norms = batch.column("surface_norm").to_pylist()
        return pa.table(
            {
                "node_id": pa.array([canonical_id(n) for n in norms], pa.string()),
                "surface_norm": batch.column("surface_norm"),
                "surface": batch.column("surface"),
                "n_mentions": batch.column("n_mentions"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def predicate_frequencies(triples_ds):
    """A7 skew probe (pubmed_analysis.py:22-31): normalized predicate →
    count, sorted desc. Same two-phase combiner shape."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for v in batch.column("rel").to_pylist():
            norm = normalize_surface(v or "")
            if norm:
                counts[norm] += 1
        return pa.table(
            {
                "rel_norm": pa.array(list(counts), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        triples_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("rel_norm")
        .aggregate(Sum("n", alias_name="n"))
        .sort("n", descending=True)
    )
