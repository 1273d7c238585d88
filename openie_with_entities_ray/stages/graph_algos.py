"""Graph algorithms over the edges table: connected components, degrees.

Connected components = min-label propagation (the alias-clustering step
for canonical entities; also the final stage of MinHash-LSH dedup per the
Ray guide): iterate "label(node) ← min(label(node), label(neighbor))"
until fixpoint.

Implementation shape: the adjacency Dataset stays distributed and static;
the label table (one row per distinct node — orders of magnitude smaller
than the edge set) is broadcast via ``ray.put`` each round, and each round
is one vectorized ``map_batches`` + per-batch partial-min + driver merge.
For label tables beyond driver memory the same loop runs as an iterative
hash join (groupby on node) — documented trade-off; component counts in
entity graphs are bounded by distinct surfaces, not edges.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def node_degrees(edges_ds, src: str = "src", dst: str = "dst"):
    """Degree per node (in+out), two-phase combiner shape."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for col in (src, dst):
            for v in batch.column(col).to_pylist():
                counts[v] += 1
        return pa.table(
            {
                "node_id": pa.array(list(counts), pa.string()),
                "degree": pa.array(list(counts.values()), pa.int64()),
            }
        )

    return (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("node_id")
        .aggregate(Sum("degree", alias_name="degree"))
    )


def connected_components(
    edges_ds, src: str = "src", dst: str = "dst", max_iters: int | None = None
):
    """Returns a pandas DataFrame (node_id, component) where component is
    the lexicographic-min node id of the component. Deterministic.

    Iterates until convergence (min-label propagation advances one hop
    per round, so rounds ≈ component diameter). ``max_iters`` is a
    safety cap only: hitting it raises instead of returning a silently
    partial labeling."""
    import ray

    # materialized: consumed once for init labels plus once per
    # propagation round — lazy would re-run the whole upstream pipeline
    # every iteration
    pairs = edges_ds.select_columns([src, dst]).materialize()

    # initial labels: every endpoint labels itself
    def init_labels(batch: pa.Table) -> pa.Table:
        nodes = set(batch.column(src).to_pylist())
        nodes.update(batch.column(dst).to_pylist())
        nodes = sorted(nodes)
        return pa.table({"node_id": pa.array(nodes, pa.string())})

    label_rows = (
        pairs.map_batches(init_labels, batch_format="pyarrow")
        .unique("node_id")
    )
    labels = {n: n for n in label_rows}

    iteration = 0
    while True:
        iteration += 1
        if max_iters is not None and iteration > max_iters:
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} "
                "iterations (component diameter exceeds the cap)"
            )
        labels_ref = ray.put(labels)

        def propagate(batch: pa.Table) -> pa.Table:
            lab = ray.get(labels_ref)
            out: dict = {}
            for u, v in zip(
                batch.column(src).to_pylist(), batch.column(dst).to_pylist()
            ):
                lo = min(lab[u], lab[v])
                for node in (u, v):
                    if lo < out.get(node, lab[node]):
                        out[node] = lo
            return pa.table(
                {
                    "node_id": pa.array(list(out), pa.string()),
                    "label": pa.array(list(out.values()), pa.string()),
                }
            )

        proposals = pairs.map_batches(propagate, batch_format="pyarrow")

        changed = False
        for row in proposals.iter_rows():
            node, label = row["node_id"], row["label"]
            if label < labels[node]:
                labels[node] = label
                changed = True
        if not changed:
            break

    return pd.DataFrame(
        {"node_id": list(labels), "component": list(labels.values())}
    ).sort_values("node_id").reset_index(drop=True)
