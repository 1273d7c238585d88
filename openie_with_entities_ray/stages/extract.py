"""The model stages: conjunction split + OIE extraction.

Two deployment shapes, same kernels:

1. :class:`ConjSplitter` / :class:`OIEExtractor` — the staged pipeline
   (sentences → split_sentences → triples). Mirrors the reference's
   splitpredict flow (/root/reference/run.py:161-243) with the driver-side
   ``mapping``/``conj_word_mapping`` dicts replaced by carried columns
   (SURVEY.md J1/J2).

2. :class:`FusedExtractor` — the scale path. Because every split of a
   sentence is produced inside the same batch iteration, per-original-
   sentence dedup + top-k (/root/reference/model.py:595-634,
   metric.py:435-438) complete *in-stage* with zero shuffle: the
   reference's corpus-wide ``all_predictions`` accumulator
   (model.py:609, its scalability wall) disappears entirely.

Both are callable classes → Ray actor pools (``map_batches(Cls,
concurrency=...)``): labeler state is built once per actor in ``__init__``
(the slot where a ``TorchGridLabeler`` would load BERT weights,
/root/reference/run.py:46-51).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.conjunctions import decode_coordinations, split_on_coordinations
from ..functions.triples import (
    decode_sentence_triples,
    dedup_exact,
    dedup_near,
    top_k,
)
from ..state.labeler import DeterministicLabeler, make_labeler

_SENT_KEY_COLS = ("repo", "path", "commit", "content_sha256", "sent_id")


def _split_sentence_rows(labeler, sentence: str, with_indices: bool = False):
    """conj label → decode → split; '' split list means identity
    (run.py:180-187: a sentence with no surviving coordination maps to
    itself). With ``with_indices``, also returns each split's sorted
    original-word index list (run.py:246-291 uses them to project labels
    back onto original positions; identity split → full range,
    run.py:256-258)."""
    rows = labeler.label_conj(sentence)
    coords = decode_coordinations(rows)
    splits, conj_words, indices = split_on_coordinations(coords, sentence.split())
    if not splits:
        splits = [sentence]
        indices = [list(range(len(sentence.split())))]
    if with_indices:
        return splits, conj_words, [sorted(ix) for ix in indices]
    return splits, conj_words


class ConjSplitter:
    """sentences → split_sentences (SPLIT_SENTENCES schema)."""

    def __init__(self, seed: int = 777, labeler_spec: dict | None = None):
        self.labeler = (make_labeler(labeler_spec) if labeler_spec
                        else DeterministicLabeler(seed=seed))

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = {c: batch.column(c).to_pylist() for c in _SENT_KEY_COLS}
        sentences = batch.column("sentence").to_pylist()
        out = {c: [] for c in _SENT_KEY_COLS}
        out_split_id, out_split, out_orig, out_conj, out_idx = [], [], [], [], []
        for row_idx, sentence in enumerate(sentences):
            splits, conj_words, indices = _split_sentence_rows(
                self.labeler, sentence, with_indices=True
            )
            for split_id, split_sentence in enumerate(splits):
                for c in _SENT_KEY_COLS:
                    out[c].append(keys[c][row_idx])
                out_split_id.append(split_id)
                out_split.append(split_sentence)
                out_orig.append(sentence)
                out_conj.append(conj_words)
                out_idx.append(indices[split_id])
        return pa.table(
            {
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "commit": pa.array(out["commit"], pa.string()),
                "content_sha256": pa.array(out["content_sha256"], pa.string()),
                "sent_id": pa.array(out["sent_id"], pa.int64()),
                "split_id": pa.array(out_split_id, pa.int64()),
                "split_sentence": pa.array(out_split, pa.string()),
                "orig_sentence": pa.array(out_orig, pa.string()),
                "conj_words": pa.array(out_conj, pa.list_(pa.string())),
                "split_indices": pa.array(out_idx, pa.list_(pa.int64())),
            }
        )


class OIEExtractor:
    """split_sentences → raw triples (before per-sentence dedup/top-k).

    Emits every valid extraction with its (split_id, depth) so a grouped
    dedup stage can reproduce the reference's first-wins order even when
    splits of one sentence land in different blocks (stages/group.py)."""

    def __init__(self, seed: int = 777, no_lt: bool = False,
                 labeler_spec: dict | None = None):
        self.labeler = (make_labeler(labeler_spec) if labeler_spec
                        else DeterministicLabeler(seed=seed))
        self.no_lt = no_lt

    def __call__(self, batch: pa.Table) -> pa.Table:
        carry_cols = [
            c
            for c in batch.column_names
            if c in _SENT_KEY_COLS + ("orig_sentence", "split_id")
        ]
        carried = {c: batch.column(c).to_pylist() for c in carry_cols}
        splits = batch.column("split_sentence").to_pylist()
        out = {c: [] for c in carry_cols}
        out_depth, out_a1, out_rel, out_a2, out_conf = [], [], [], [], []
        for row_idx, split_sentence in enumerate(splits):
            rows, confs = self.labeler.label_oie(split_sentence)
            for depth, triple in decode_sentence_triples(
                rows, confs, split_sentence, no_lt=self.no_lt
            ):
                for c in carry_cols:
                    out[c].append(carried[c][row_idx])
                out_depth.append(depth)
                out_a1.append(triple.arg1)
                out_rel.append(triple.rel)
                out_a2.append(triple.arg2)
                out_conf.append(triple.confidence)
        # type carried columns from the INPUT schema: an inferred
        # pa.array([]) is null-typed, and one zero-triple batch would
        # corrupt the Dataset schema (round-4 mixed-block hazard)
        cols = {
            c: pa.array(out[c], type=batch.schema.field(c).type)
            for c in carry_cols
        }
        cols["depth"] = pa.array(out_depth, pa.int64())
        cols["arg1"] = pa.array(out_a1, pa.string())
        cols["rel"] = pa.array(out_rel, pa.string())
        cols["arg2"] = pa.array(out_a2, pa.string())
        cols["confidence"] = pa.array(out_conf, pa.float64())
        return pa.table(cols)


class FusedExtractor:
    """sentences → final per-sentence triples, dedup + top-k in-stage.

    The unit of work is one original sentence row, so all cross-split state
    the reference keeps in driver dicts (mapping, conj_word_mapping,
    all_predictions) is local to the loop body — no shuffle, no
    accumulator, O(batch) memory.
    """

    def __init__(
        self,
        seed: int = 777,
        num_extractions: int = 5,
        no_lt: bool = False,
        near_dedup: bool = False,
        labeler_spec: dict | None = None,
    ):
        self.labeler = (make_labeler(labeler_spec) if labeler_spec
                        else DeterministicLabeler(seed=seed))
        self.num_extractions = num_extractions
        self.no_lt = no_lt
        self.near_dedup = near_dedup  # off by default (metric.py:426-430)

    def extract_one(self, sentence: str):
        """All surviving triples of one original sentence, in final order."""
        splits, conj_words = _split_sentence_rows(self.labeler, sentence)
        collected = []  # (split_id, depth, Triple) in reference encounter order
        for split_id, split_sentence in enumerate(splits):
            rows, confs = self.labeler.label_oie(split_sentence)
            for depth, triple in decode_sentence_triples(
                rows, confs, split_sentence, no_lt=self.no_lt
            ):
                collected.append((split_id, depth, triple))
        triples = dedup_exact(t for _, _, t in collected)
        if self.near_dedup:
            triples = dedup_near(triples, conj_words)
        kept = top_k(triples, self.num_extractions)
        # recover (split_id, depth) provenance for the survivors
        by_id = {id(t): (s, d) for s, d, t in collected}
        return [(by_id[id(t)][0], by_id[id(t)][1], t) for t in kept]

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = {c: batch.column(c).to_pylist() for c in _SENT_KEY_COLS}
        sentences = batch.column("sentence").to_pylist()
        out = {c: [] for c in _SENT_KEY_COLS}
        out_split, out_depth, out_orig = [], [], []
        out_a1, out_rel, out_a2, out_conf = [], [], [], []
        for row_idx, sentence in enumerate(sentences):
            for split_id, depth, t in self.extract_one(sentence):
                for c in _SENT_KEY_COLS:
                    out[c].append(keys[c][row_idx])
                out_split.append(split_id)
                out_depth.append(depth)
                out_orig.append(sentence)
                out_a1.append(t.arg1)
                out_rel.append(t.rel)
                out_a2.append(t.arg2)
                out_conf.append(t.confidence)
        return pa.table(
            {
                "repo": pa.array(out["repo"], pa.string()),
                "path": pa.array(out["path"], pa.string()),
                "commit": pa.array(out["commit"], pa.string()),
                "content_sha256": pa.array(out["content_sha256"], pa.string()),
                "sent_id": pa.array(out["sent_id"], pa.int64()),
                "split_id": pa.array(out_split, pa.int64()),
                "depth": pa.array(out_depth, pa.int64()),
                "orig_sentence": pa.array(out_orig, pa.string()),
                "arg1": pa.array(out_a1, pa.string()),
                "rel": pa.array(out_rel, pa.string()),
                "arg2": pa.array(out_a2, pa.string()),
                "confidence": pa.array(out_conf, pa.float64()),
            }
        )
