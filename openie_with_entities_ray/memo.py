"""Size-gated, job-scoped memoization for small fixture-scale datasets.

The driver's correctness gate and ``tools/check_queries.py`` run all
~140 registry queries in ONE process against the same sf directory, and
many of them re-execute identical sub-pipelines: the raw parquet reads
(111 sites) and the flagship extraction (``extract_triples`` over the
whole corpus, ~15 sites). Re-running those per query is pure overhead at
gate scale — but materializing them would be a scale-killer at 100 TB,
so every memo here is **gated on the on-disk size of its input**: below
``OIE_MEMO_MAX_BYTES`` (default 256 MiB) the first execution is
materialized and reused; at or above it (i.e. anything
production-sized) the memo is a transparent pass-through and the
pipeline streams exactly as before. Set ``OIE_MEMO_MAX_BYTES=0`` to
disable memoization entirely.

Keys include Ray's current job id so object references never leak
across ``ray.init()`` sessions (a fresh init invalidates the old
object store contents).
"""

from __future__ import annotations

import os

_MEMO: dict[tuple, object] = {}
_DEFAULT_MAX_BYTES = 256 * 1024 * 1024


def memo_max_bytes() -> int:
    return int(os.environ.get("OIE_MEMO_MAX_BYTES", _DEFAULT_MAX_BYTES))


def _path_bytes(path: str) -> int | None:
    """Total bytes of a parquet file or directory of files; None if unknown."""
    try:
        if os.path.isdir(path):
            total = 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    total += os.path.getsize(os.path.join(root, f))
            return total
        return os.path.getsize(path)
    except OSError:
        return None


def _path_stamp(path: str):
    """(total bytes, newest mtime_ns) of a file or directory tree — the
    freshness token memo keys carry so a rewritten input can never serve
    stale cached datasets (same invariant as cached_read_parquet's
    per-file stamp). None when the path is unreadable."""
    try:
        if os.path.isdir(path):
            total, newest = 0, 0
            for root, _dirs, files in os.walk(path):
                for f in files:
                    st = os.stat(os.path.join(root, f))
                    total += st.st_size
                    newest = max(newest, st.st_mtime_ns)
            return (total, newest)
        st = os.stat(path)
        return (st.st_size, st.st_mtime_ns)
    except OSError:
        return None


def _job_token():
    """Current Ray job id, or None if Ray is not initialized yet."""
    import ray

    if not ray.is_initialized():
        return None
    try:
        return ray.get_runtime_context().get_job_id()
    except Exception:  # pragma: no cover - defensive
        return None


def dataset_memo(key: tuple, thunk, *, gate_path: str):
    """Materialize-and-reuse ``thunk()`` iff ``gate_path`` is small.

    ``thunk`` must build a ``ray.data.Dataset``; the memo executes it
    once per (Ray job, key) and returns the materialized dataset on
    later calls. When the gate file is missing, unreadable, or at least
    ``memo_max_bytes()``, the thunk's lazy dataset is returned untouched
    (streaming semantics preserved — nothing is pinned).
    """
    limit = memo_max_bytes()
    size = _path_bytes(gate_path)
    if limit <= 0 or size is None or size >= limit:
        return thunk()
    tok = _job_token()
    # the gate file's stamp keys the entry: rewriting the input at the
    # same path invalidates every pipeline memo derived from it
    stamp = _path_stamp(gate_path)
    full_key = (tok, stamp, *key)
    ds = _MEMO.get(full_key)
    if ds is None:
        ds = thunk().materialize()
        if tok is None:
            # thunk's execution initialized Ray; re-key under the live job
            # so a later ray.shutdown()/init() cannot resurrect stale refs.
            full_key = (_job_token(), stamp, *key)
        _MEMO[full_key] = ds
    return ds


def cached_read_parquet(path: str, *, columns=None, **kwargs):
    """Drop-in ``ray.data.read_parquet`` with the size-gated memo.

    Same signature; extra reader kwargs (filters, overrides) bypass the
    cache — only the plain (path, columns) shape is memoized.
    """
    import ray.data

    if kwargs:
        return ray.data.read_parquet(path, columns=columns, **kwargs)
    try:
        st = os.stat(path)
        stamp = (st.st_size, st.st_mtime_ns)
    except OSError:
        stamp = None
    key = (
        "read_parquet",
        os.path.abspath(path),
        stamp,  # a rewritten file can never serve stale cached blocks
        tuple(columns) if columns is not None else None,
    )
    return dataset_memo(
        key,
        lambda: ray.data.read_parquet(path, columns=columns),
        gate_path=path,
    )


def clear_memo() -> None:
    """Drop every cached dataset (tests / long-lived drivers)."""
    _MEMO.clear()
