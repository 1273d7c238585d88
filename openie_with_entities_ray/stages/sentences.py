"""Stage S1/O1/O2/O4: source_docs → sentences.

One map_batches over Arrow batches: per doc, sha256 the content (lineage
column, north-rule invariant), mine comment/docstring text, split into
sentences, normalize (quotes + punctuation spacing + whitespace re-join,
/root/reference/data.py:428-438), cap at 100 words
(/root/reference/data.py:284). One row in → N sentence rows out, provenance
keys carried on every row so no later stage needs a driver-side mapping.

Stateless tasks (no model state); the per-doc work is regex-bound, so the
kernel compiles its regexes at module import (once per worker process).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import extract_sentences, sha256_hex


def _explode_batch(batch: pa.Table) -> pa.Table:
    repos = batch.column("repo").to_pylist()
    paths = batch.column("path").to_pylist()
    commits = batch.column("commit").to_pylist()
    langs = batch.column("lang").to_pylist()
    contents = batch.column("content").to_pylist()

    out_repo, out_path, out_commit, out_sha = [], [], [], []
    out_sent_id, out_sentence = [], []
    for repo, path, commit, lang, content in zip(
        repos, paths, commits, langs, contents
    ):
        sha = sha256_hex(content)
        for sent_id, sentence in enumerate(extract_sentences(content, lang)):
            out_repo.append(repo)
            out_path.append(path)
            out_commit.append(commit)
            out_sha.append(sha)
            out_sent_id.append(sent_id)
            out_sentence.append(sentence)
    return pa.table(
        {
            "repo": pa.array(out_repo, pa.string()),
            "path": pa.array(out_path, pa.string()),
            "commit": pa.array(out_commit, pa.string()),
            "content_sha256": pa.array(out_sha, pa.string()),
            "sent_id": pa.array(out_sent_id, pa.int64()),
            "sentence": pa.array(out_sentence, pa.string()),
        }
    )


def docs_to_sentences(docs_ds, *, batch_size: int = 256):
    """source_docs Dataset → sentences Dataset (SENTENCES schema)."""
    return docs_ds.map_batches(
        _explode_batch, batch_format="pyarrow", batch_size=batch_size
    )
