"""Graph materialization: triples → node/edge Parquet with resumable,
manifest-tracked partitioned output.

Replaces the reference's append-mode output files
(/root/reference/model.py:697-701 — a crashed run leaves a partial,
unresumable file) with idempotent per-partition Parquet + a manifest:

    out_dir/
      edges/part=<k>/...parquet      (one partition per input shard —
                                      flagship.resumable_materialize
                                      binds part k to input_shards[k])
      nodes/...parquet
      _manifests/part-<k>.json       {"partition": k, "rows": n,
                                      "elapsed_s": ..., "input": shard}

Resume = anti-join of existing manifests against the partition plan: a
re-run processes only partitions whose manifest is missing, then yields
byte-identical output (every stage is a pure function of the input rows).
"""

from __future__ import annotations

import json
import os
import zlib

import pyarrow as pa


_CANON_MEMO: dict = {}  # per-worker-process memo: surfaces are Zipf


def triples_to_edges(batch: pa.Table) -> pa.Table:
    """EDGES schema: canonical src/dst from normalized arg surfaces (linked
    entity id when the entity stage provided exactly one)."""
    from .canonical import canonical_id, normalize_surface

    def canon(surface: str) -> str:
        hit = _CANON_MEMO.get(surface)
        if hit is None:
            if len(_CANON_MEMO) > 500_000:
                _CANON_MEMO.clear()
            hit = canonical_id(normalize_surface(surface))
            _CANON_MEMO[surface] = hit
        return hit

    a1 = batch.column("arg1").to_pylist()
    a2 = batch.column("arg2").to_pylist()
    subj_ents = (
        batch.column("subj_ents").to_pylist()
        if "subj_ents" in batch.column_names
        else [[] for _ in a1]
    )
    obj_ents = (
        batch.column("obj_ents").to_pylist()
        if "obj_ents" in batch.column_names
        else [[] for _ in a1]
    )

    def node_of(surface, ents):
        if ents and len(ents) == 1:
            return ents[0]
        return canon(surface)

    cols = {
        "src": pa.array(
            [node_of(s, e) for s, e in zip(a1, subj_ents)], pa.string()
        ),
        "dst": pa.array(
            [node_of(s, e) for s, e in zip(a2, obj_ents)], pa.string()
        ),
        "rel": batch.column("rel"),
        "confidence": batch.column("confidence"),
        "repo": batch.column("repo"),
        "path": batch.column("path"),
        "commit": batch.column("commit"),
        "sent_id": batch.column("sent_id"),
    }
    return pa.table(cols)


def dedup_edges(edges_ds, num_parts: int | None = None):
    """Corpus-level exact edge dedup (SURVEY.md §2.8): keep the
    max-confidence witness per (src, rel, dst).

    Scale shape: coarse hash partition of the edge key (cluster-scaled
    part count — the ``distinct_pairs`` idiom, dataops.py:121) and ONE
    vectorized pandas sort + ``groupby(edge_key).head(1)`` inside each
    part. Never ``groupby(edge_key)`` directly: Ray pays ~1 ms of Python
    per aggregate group (measured, BASELINE.md tail), so one Ray group
    per distinct edge walls at ~1e6 s for 1e9 distinct edges; this shape
    pays #parts group calls regardless of corpus size."""
    from .dataops import _cluster_parts

    if num_parts is None:
        num_parts = _cluster_parts()

    def key(batch: pa.Table) -> pa.Table:
        # crc32 over the composite key bytes: a PARTITION key only needs
        # co-location (a collision is harmless), but it reuses the same
        # injective encoding as the group key
        from .dataops import composite_key_bytes

        keys = composite_key_bytes(
            batch.column("src").to_pylist(),
            batch.column("rel").to_pylist(),
            batch.column("dst").to_pylist(),
        )
        parts = [zlib.crc32(k) % num_parts for k in keys]
        return batch.append_column("edge_part", pa.array(parts, pa.int64()))

    def first_per_key(group):
        return best_edge_per_key(group).drop(columns=["edge_part"])

    return (
        # per-batch partial dedup BEFORE the shuffle (the combiner shape):
        # duplicate edges are heavily batch-local (same doc/sentence), so
        # the sort moves ~distinct rows instead of the full edge table.
        # Safe because best-row-per-key selection under a total row order
        # is associative (property-tested against the shipped kernel).
        edges_ds.map_batches(
            best_edge_per_key, batch_format="pandas", batch_size=65536
        )
        .map_batches(key, batch_format="pyarrow")
        .groupby("edge_part")
        .map_groups(first_per_key, batch_format="pandas")
    )


def edge_provenance(edges_ds, *, k: int = 3, num_parts: int | None = None):
    """Per-edge lineage aggregation (the north rule's per-partition
    lineage surface): for every (src, rel, dst), the total witness
    count plus the first-k sorted witness refs ``repo:path:sent_id`` —
    output is BOUNDED per edge however hot it is (a 10^9-witness
    stopword edge still emits one row carrying k refs).

    Combiner shape: within-batch partial (count + k-smallest witness
    strings per edge) → coarse crc32(edge key) partition → in-part
    pandas merge (sum counts; union the ≤ k·batches candidate refs,
    re-sort, slice k). k-min of a union of per-batch k-mins is the
    global k-min, so the result is partition-invariant."""
    from .dataops import _cluster_parts, composite_key_bytes

    if num_parts is None:
        num_parts = _cluster_parts()

    def partial(batch: pa.Table) -> pa.Table:
        agg: dict = {}
        for s, r, d, rp, pt, si in zip(
            batch.column("src").to_pylist(),
            batch.column("rel").to_pylist(),
            batch.column("dst").to_pylist(),
            batch.column("repo").to_pylist(),
            batch.column("path").to_pylist(),
            batch.column("sent_id").to_pylist(),
        ):
            ent = agg.setdefault((s, r, d), [0, []])
            ent[0] += 1
            ent[1].append(f"{rp}:{pt}:{si}")
        keys = sorted(agg)
        tbl = pa.table(
            {
                "src": pa.array([x[0] for x in keys], pa.string()),
                "rel": pa.array([x[1] for x in keys], pa.string()),
                "dst": pa.array([x[2] for x in keys], pa.string()),
                "n": pa.array([agg[x][0] for x in keys], pa.int64()),
                "wits": pa.array(
                    [sorted(agg[x][1])[:k] for x in keys],
                    pa.list_(pa.string()),
                ),
            }
        )
        parts = [
            zlib.crc32(kk) % num_parts
            for kk in composite_key_bytes(
                tbl.column("src").to_pylist(),
                tbl.column("rel").to_pylist(),
                tbl.column("dst").to_pylist(),
            )
        ]
        return tbl.append_column("part", pa.array(parts, pa.int64()))

    def merge(g):
        g = g.assign(
            _k=composite_key_bytes(g["src"], g["rel"], g["dst"])
        )
        out = g.groupby("_k", as_index=False).agg(
            src=("src", "first"), rel=("rel", "first"),
            dst=("dst", "first"), n_witnesses=("n", "sum"),
            wits=("wits", lambda col: sorted(
                w for lst in col for w in lst
            )[:k]),
        )
        out["witnesses"] = [",".join(ws) for ws in out["wits"]]
        return out[["src", "rel", "dst", "n_witnesses", "witnesses"]]

    return (
        edges_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pandas")
    )


def kg_snapshot_diff(edges_a, edges_b, *, num_parts: int | None = None):
    """Diff two DEDUPED edge snapshots — the incremental-build
    primitive (which edges a new corpus revision adds, removes, or
    rescores). Inputs carry one row per (src, rel, dst) with
    ``conf_centi``. Output: one row per DIFFERING key with status ∈
    {'added' (B only), 'removed' (A only), 'changed' (conf differs)}
    and both sides' conf (NULL where absent, nullable Int64 — see the
    int64 round-trip memory note).

    Shape: tag each side, union, ONE coarse crc32(edge key) exchange,
    in-part vectorized pandas outer merge — unchanged keys die inside
    their part, so only the diff leaves the exchange."""
    from .dataops import _cluster_parts, composite_key_bytes

    if num_parts is None:
        num_parts = _cluster_parts()

    def tag(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            keys = composite_key_bytes(
                batch.column("src").to_pylist(),
                batch.column("rel").to_pylist(),
                batch.column("dst").to_pylist(),
            )
            return pa.table(
                {
                    "src": batch.column("src"),
                    "rel": batch.column("rel"),
                    "dst": batch.column("dst"),
                    "conf_centi": batch.column("conf_centi"),
                    "side": pa.array([side] * batch.num_rows, pa.string()),
                    "part": pa.array(
                        [zlib.crc32(k) % num_parts for k in keys],
                        pa.int64(),
                    ),
                }
            )

        return fn

    def diff_part(g):
        import numpy as np
        import pandas as pd

        g = g.assign(
            _k=composite_key_bytes(g["src"], g["rel"], g["dst"])
        )
        cols = ["_k", "src", "rel", "dst", "conf_centi"]
        m = g[g["side"] == "a"][cols].merge(
            g[g["side"] == "b"][cols],
            on="_k", how="outer", suffixes=("_a", "_b"), indicator=True,
        )
        status = np.where(
            m["_merge"] == "right_only", "added",
            np.where(
                m["_merge"] == "left_only", "removed",
                np.where(
                    m["conf_centi_a"] != m["conf_centi_b"],
                    "changed", "unchanged",
                ),
            ),
        )
        m = m.assign(status=status)
        m = m[m["status"] != "unchanged"]
        return pd.DataFrame(
            {
                "src": m["src_a"].where(m["src_a"].notna(), m["src_b"]),
                "rel": m["rel_a"].where(m["rel_a"].notna(), m["rel_b"]),
                "dst": m["dst_a"].where(m["dst_a"].notna(), m["dst_b"]),
                "status": m["status"],
                # -1 sentinel for "absent on this side": keeps both the
                # engine and the SQL oracle in plain int64 (a NULL int
                # would force float64 on one side and Int64 on the
                # other — dtype mismatch at the driver's schema gate)
                "conf_a": m["conf_centi_a"].fillna(-1).astype("int64"),
                "conf_b": m["conf_centi_b"].fillna(-1).astype("int64"),
            }
        )

    return (
        edges_a.map_batches(tag("a"), batch_format="pyarrow")
        .union(edges_b.map_batches(tag("b"), batch_format="pyarrow"))
        .groupby("part")
        .map_groups(diff_part, batch_format="pandas")
    )


# Tie-break columns forming a TOTAL order over witness rows: every
# identity column an edge/triple table can carry participates, so the
# surviving witness is identical under any batching/partitioning (the
# pre-shuffle combiner depends on this — a partial order would make the
# winner depend on batch boundaries for rows tying on a prefix).
_EDGE_TIEBREAK = ("repo", "path", "commit", "sent_id", "split_id", "depth")


def _edge_sort_spec(df):
    by = ["confidence"] + [c for c in _EDGE_TIEBREAK if c in df.columns]
    return dict(
        by=by,
        ascending=[False] + [True] * (len(by) - 1),
        kind="mergesort",
    )


def best_edge_per_key(df):
    """THE edge-dedup kernel (module-level so the combiner, the final
    per-part pass, and the associativity property test all run the same
    code): max-confidence witness per (src, rel, dst), keyed by the
    injective NUL-safe composite bytes key."""
    from .dataops import composite_key_bytes

    return (
        df.assign(
            _k=composite_key_bytes(df["src"], df["rel"], df["dst"])
        )
        .sort_values(**_edge_sort_spec(df))
        .groupby("_k", sort=False)
        .head(1)
        .drop(columns=["_k"])
    )


# ---------------------------------------------------------------------------
# resumable partitioned writer


def _manifest_path(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, "_manifests", f"part-{part}.json")


def manifest_input(out_dir: str, part: int):
    """The ``input`` field a completed partition's manifest recorded
    (shard path lineage), or None when absent/unreadable — resume
    callers compare it against the shard they are about to skip."""
    try:
        with open(_manifest_path(out_dir, part)) as f:
            return json.load(f).get("input")
    except (OSError, ValueError):
        return None


def completed_partitions(out_dir: str) -> set:
    mdir = os.path.join(out_dir, "_manifests")
    if not os.path.isdir(mdir):
        return set()
    done = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            done.add(int(name[len("part-") : -len(".json")]))
    return done


def write_partition(ds_part, out_dir: str, part: int, extra_meta=None,
                    partition_cols=None) -> dict:
    """Write one partition's rows + manifest atomically. A partition is
    only declared done by its manifest (tmp file + rename); any parquet
    files from a previous crashed attempt are DELETED before rewriting —
    Ray names output files with fresh UUIDs, so without the cleanup a
    resume would double-count the partial files. Row counts come from the
    written files' own metadata (one pipeline execution, not two). The
    manifest carries the north rule's lineage + metrics: row count, wall
    time, and whatever the caller adds (input shard path/sha).
    ``partition_cols`` hive-partitions the rows WITHIN the partition dir
    (``part=<k>/<col>=<v>/...``) so downstream readers can prune at the
    storage level (jobs/ann_job.py prunes IVF buckets this way)."""
    import shutil
    import time

    import pyarrow.dataset as pads

    t0 = time.perf_counter()
    dest = os.path.join(out_dir, f"part={part}")
    if os.path.isdir(dest):
        shutil.rmtree(dest)  # crashed earlier attempt: manifest is absent
    if partition_cols:
        ds_part.write_parquet(dest, partition_cols=list(partition_cols))
    else:
        ds_part.write_parquet(dest)
    # an empty partition writes no files/dir at all — still a valid,
    # completed partition (e.g. a dedup shard with zero dup pairs)
    rows = (
        pads.dataset(dest, format="parquet").count_rows()
        if os.path.isdir(dest)
        else 0
    )
    meta = {
        "partition": part,
        "rows": rows,
        "elapsed_s": round(time.perf_counter() - t0, 3),
    }
    if extra_meta:
        meta.update(extra_meta)
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    tmp = _manifest_path(out_dir, part) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _manifest_path(out_dir, part))
    return meta
