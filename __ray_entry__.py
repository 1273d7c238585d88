"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json). Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the library ever calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship KG-construction pipeline on /root/testdata/sf0.001:
    source_docs → sentences → conj-split + OIE extraction (actor pool) →
    entity tag/link → triples with entity-typed args."""
    from openie_with_entities_ray.pipelines.flagship import (
        extract_triples_with_entities,
    )
    from openie_with_entities_ray.sources.source_docs import read_source_docs

    docs = read_source_docs("/root/testdata/sf0.001")
    return extract_triples_with_entities(docs)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from openie_with_entities_ray.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY queries() entry (39/39): the
    labeler/NER pipeline is recomputed in SQL by oracles.py, and the
    approximate LSH near-dup path embeds its plane constants as SQL
    literals."""
    from openie_with_entities_ray.queries import build_oracle_sql

    return build_oracle_sql()
