"""Skew-aware joins (north rule: "explicit hash partitioning and salted
keys for skewed popular entities").

``Dataset.join`` hash-partitions both sides by the join key, so a hot
key (a Zipf-head entity, a celebrity user id) funnels ALL of its rows
into one aggregator partition — the straggler that caps a 100 TB join.
:func:`salted_join` breaks the hot partition by salting: the BIG side
gets a round-robin salt in [0, num_salts) (any per-row value works —
the salt never reaches the output), the SMALL-ISH side is replicated
once per salt, and the join key becomes (key, salt), spreading each hot
key over ``num_salts`` partitions. Inner-join semantics are preserved
exactly: every (left row, right row) key match meets in exactly one
salted partition.

Cost model: the replicated side pays num_salts x its size in shuffle
traffic — use it when one side is small enough to replicate but too
large (or too frequently re-joined) to broadcast, and the other side is
skewed. A truly tiny side should stay a ``ray.put`` broadcast lookup
(see revenue_by_nation); a balanced large-large join should stay a
plain ``Dataset.join``.
"""

from __future__ import annotations

import pyarrow as pa

from .dataops import cluster_cpus

_SALT = "__salt"


def salted_join(
    big_ds,
    rep_ds,
    *,
    on: str,
    right_on: str | None = None,
    num_salts: int | None = None,
    num_partitions: int | None = None,
):
    """Inner join with the BIG (possibly key-skewed) side salted and the
    other side replicated ``num_salts`` times. Returns the joined
    Dataset without the salt column; output rows are exactly those of
    the plain inner join (pytest-gated)."""
    import numpy as np

    if right_on is None:
        right_on = on
    if num_salts is None:
        num_salts = max(2, cluster_cpus() // 4)
    if num_partitions is None:
        num_partitions = max(2, cluster_cpus() // 4)

    def add_salt(batch: pa.Table) -> pa.Table:
        # round-robin within the batch: uniform by construction, no RNG,
        # and irrelevant to the output (the salt only routes the row)
        return batch.append_column(
            _SALT,
            pa.array(np.arange(batch.num_rows) % num_salts, pa.int64()),
        )

    def replicate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(
            [i for i in range(n) for _ in range(num_salts)], pa.int64()
        )
        out = batch.take(idx)
        return out.append_column(
            _SALT,
            pa.array(list(range(num_salts)) * n, pa.int64()),
        )

    joined = big_ds.map_batches(add_salt, batch_format="pyarrow").join(
        rep_ds.map_batches(replicate, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, _SALT),
        right_on=(right_on, _SALT),
    )
    return joined.drop_columns([_SALT])
