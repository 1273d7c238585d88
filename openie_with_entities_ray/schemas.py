"""Arrow schemas for every stage boundary (SURVEY.md §1.4).

One logical table per stage; blocks are Arrow tables end-to-end
(``map_batches(batch_format="pyarrow")``). Provenance keys
(repo, path, commit, sent_id, split_id, depth) ride along every row so no
stage ever needs a driver-side dict (the reference's ``mapping`` /
``conj_word_mapping`` dicts, run.py:163-226, become columns).
"""

from __future__ import annotations

import pyarrow as pa

# Input table per BASELINE.json input_hint.
SOURCE_DOCS = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

# source_docs + lineage column (north-rule invariant: per-row sha256 of
# content carried unchanged through the pipeline).
DOC_KEYS = [
    ("repo", pa.string()),
    ("path", pa.string()),
    ("commit", pa.string()),
    ("content_sha256", pa.string()),
]

SENTENCES = pa.schema(
    DOC_KEYS
    + [
        ("sent_id", pa.int64()),
        ("sentence", pa.string()),  # normalized, space-tokenized, marker-free
    ]
)

SPLIT_SENTENCES = pa.schema(
    DOC_KEYS
    + [
        ("sent_id", pa.int64()),
        ("split_id", pa.int64()),
        ("split_sentence", pa.string()),
        ("orig_sentence", pa.string()),
        ("conj_words", pa.list_(pa.string())),
    ]
)

TRIPLES = pa.schema(
    DOC_KEYS
    + [
        ("sent_id", pa.int64()),
        ("split_id", pa.int64()),
        ("depth", pa.int64()),
        ("orig_sentence", pa.string()),
        ("arg1", pa.string()),
        ("rel", pa.string()),
        ("arg2", pa.string()),
        ("confidence", pa.float64()),
    ]
)

MENTIONS = pa.schema(
    [
        ("surface", pa.string()),
        ("type", pa.string()),
        ("canonical_id", pa.string()),
    ]
)

NODES = pa.schema(
    [
        ("node_id", pa.string()),
        ("surface", pa.string()),
        ("type", pa.string()),
        ("n_mentions", pa.int64()),
    ]
)

EDGES = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("rel", pa.string()),
        ("confidence", pa.float64()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("sent_id", pa.int64()),
    ]
)
