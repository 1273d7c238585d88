"""Dictionary NER tagger + entity linker (actor-pool state).

The reference's mention detector is a Flair/spaCy tagger held as module
state (/root/reference/data.py:28,34-74,138-169). Its *contract* — spans
over whitespace tokens flattened to per-word ``ent`` (binary) and
``ent_pos`` (1-based entity ordinal), with overlapping spans skipped (the
"Texas-Louisiana problem", data.py:52-66) — is what downstream consumes.
Those neural weights are not available here, so the default backend is a
deterministic longest-match dictionary tagger over a fixed alias
dictionary (FIXTURES.md F7); the backend is pluggable exactly like the
reference's ``--ent_extractor flair|spacy`` (/root/reference/params.py:38-39,
dispatch data.py:327-330).

Entity linking follows the north star: candidate generation via the alias
dictionary, disambiguation by context-embedding cosine score. Embeddings
are deterministic hash-derived unit vectors (no external models), so two
runs at any parallelism agree bit-for-bit.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional, Tuple

import numpy as np

# ~50-entry alias dictionary: surface -> list of (canonical_id, type).
# Ambiguous surfaces (>1 candidate) exercise the disambiguation scorer.
ALIAS_DICT: Dict[str, List[Tuple[str, str]]] = {}


def _add(canonical_id: str, typ: str, *surfaces: str) -> None:
    for s in surfaces:
        ALIAS_DICT.setdefault(s, []).append((canonical_id, typ))


_add("Q_acme", "ORG", "Acme", "Acme Corp", "Acme Corporation")
_add("Q_globex", "ORG", "Globex", "Globex Inc")
_add("Q_initech", "ORG", "Initech")
_add("Q_umbrella", "ORG", "Umbrella", "Umbrella Systems")
_add("Q_stark", "ORG", "Stark Industries", "Stark")
_add("Q_wayne", "ORG", "Wayne Enterprises", "Wayne")
_add("Q_hooli", "ORG", "Hooli")
_add("Q_vandelay", "ORG", "Vandelay", "Vandelay Industries")
_add("Q_alice", "PER", "Alice", "Alice Chen")
_add("Q_bob", "PER", "Bob", "Bob Martinez")
_add("Q_carol", "PER", "Carol", "Carol Okafor")
_add("Q_dave", "PER", "Dave", "Dave Kim")
_add("Q_erin", "PER", "Erin", "Erin Walsh")
_add("Q_frank", "PER", "Frank", "Frank Ito")
_add("Q_grace", "PER", "Grace", "Grace Park")
_add("Q_turing", "PER", "Turing", "Alan Turing")
_add("Q_hopper", "PER", "Hopper", "Grace Hopper")
_add("Q_newyork", "LOC", "New York", "NYC")
_add("Q_london", "LOC", "London")
_add("Q_tokyo", "LOC", "Tokyo")
_add("Q_berlin", "LOC", "Berlin")
_add("Q_austin", "LOC", "Austin")
_add("Q_paris_fr", "LOC", "Paris")
_add("Q_paris_tx", "LOC", "Paris")  # ambiguous with Q_paris_fr
_add("Q_mercury_planet", "LOC", "Mercury")
_add("Q_mercury_element", "MISC", "Mercury")  # ambiguous
_add("Q_python", "MISC", "Python")
_add("Q_rust", "MISC", "Rust")
_add("Q_kafka_sys", "MISC", "Kafka")
_add("Q_kafka_per", "PER", "Kafka")  # ambiguous
_add("Q_arrow", "MISC", "Arrow", "Apache Arrow")
_add("Q_ray", "MISC", "Ray")
_add("Q_spark", "MISC", "Spark", "Apache Spark")
_add("Q_texas", "LOC", "Texas")
_add("Q_louisiana", "LOC", "Louisiana")

_MAX_SURFACE_WORDS = max(len(s.split()) for s in ALIAS_DICT)

_EMB_DIM = 32


def _hash_vector(key: str, dim: int = _EMB_DIM) -> np.ndarray:
    """Deterministic unit vector from a string (no external embeddings)."""
    raw = hashlib.sha256(key.encode("utf-8")).digest()
    # expand to dim bytes deterministically
    buf = bytearray()
    counter = 0
    while len(buf) < dim:
        buf.extend(hashlib.sha256(raw + bytes([counter])).digest())
        counter += 1
    v = np.frombuffer(bytes(buf[:dim]), dtype=np.uint8).astype(np.float64)
    v = v - v.mean()
    norm = np.linalg.norm(v)
    return v / norm if norm > 0 else v


class Mention:
    __slots__ = ("start", "end", "surface", "type", "canonical_id")

    def __init__(self, start, end, surface, typ, canonical_id=None):
        self.start = start
        self.end = end
        self.surface = surface
        self.type = typ
        self.canonical_id = canonical_id


class CapitalizedRunNER:
    """Second pluggable backend (the reference's ``--ent_extractor
    flair|spacy`` switch, params.py:38-39): tags maximal runs of
    capitalized tokens (skipping sentence-initial lone function words) as
    MISC mentions. Same contract as DictionaryNER; no dictionary, so
    canonical ids are content-addressed from the surface."""

    def __init__(self):
        import hashlib

        self._hashlib = hashlib

    def find_mentions(self, words):
        mentions = []
        i = 0
        n = len(words)
        while i < n:
            if words[i][:1].isupper() and (i > 0 or len(words[i]) > 1):
                j = i
                while j + 1 < n and words[j + 1][:1].isupper():
                    j += 1
                surface = " ".join(words[i : j + 1])
                mentions.append(Mention(i, j, surface, "MISC", None))
                i = j + 1
            else:
                i += 1
        return mentions

    def word_features(self, words):
        ent = [0] * len(words)
        ent_pos = [0] * len(words)
        for ordinal, m in enumerate(self.find_mentions(words), start=1):
            for k in range(m.start, m.end + 1):
                ent[k] = 1
                ent_pos[k] = ordinal
        return ent, ent_pos

    def link(self, mention, context_words):
        cid = "S" + self._hashlib.sha1(
            mention.surface.lower().encode("utf-8")
        ).hexdigest()[:16]
        return cid, mention.type

    def tag_and_link(self, words):
        mentions = self.find_mentions(words)
        for m in mentions:
            m.canonical_id, m.type = self.link(m, words)
        return mentions


def make_ner(backend: str = "dictionary", alias_dict=None):
    """Backend dispatch (data.py:327-330 analogue)."""
    if backend == "dictionary":
        return DictionaryNER(alias_dict)
    if backend == "capitalized":
        return CapitalizedRunNER()
    raise ValueError(f"unknown ent_extractor backend: {backend}")


class DictionaryNER:
    """Longest-match dictionary tagger with the reference NER contract."""

    def __init__(self, alias_dict: Optional[Dict[str, List[Tuple[str, str]]]] = None):
        self.alias_dict = alias_dict if alias_dict is not None else ALIAS_DICT
        self.max_words = (
            max(len(s.split()) for s in self.alias_dict) if self.alias_dict else 1
        )
        # canonical-id embeddings computed once (actor __init__ amortization)
        self._id_vecs = {
            cid: _hash_vector(cid)
            for cands in self.alias_dict.values()
            for cid, _ in cands
        }

    def find_mentions(self, words: List[str]) -> List[Mention]:
        """Greedy left-to-right longest match; overlapping matches skipped
        (data.py:52-66 overlap-skip semantics)."""
        mentions = []
        i = 0
        n = len(words)
        while i < n:
            matched = None
            for span in range(min(self.max_words, n - i), 0, -1):
                surface = " ".join(words[i : i + span])
                if surface in self.alias_dict:
                    matched = (span, surface)
                    break
            if matched:
                span, surface = matched
                cands = self.alias_dict[surface]
                mentions.append(
                    Mention(i, i + span - 1, surface, cands[0][1], None)
                )
                i += span
            else:
                i += 1
        return mentions

    def word_features(self, words: List[str]):
        """Per-word (ent, ent_pos) vectors — data.py:34-74 contract:
        ``ent[i]=1`` iff word i is inside an entity; ``ent_pos[i]`` = 1-based
        ordinal of the covering entity (0 outside)."""
        ent = [0] * len(words)
        ent_pos = [0] * len(words)
        for ordinal, m in enumerate(self.find_mentions(words), start=1):
            for k in range(m.start, m.end + 1):
                ent[k] = 1
                ent_pos[k] = ordinal
        return ent, ent_pos

    def link(self, mention: Mention, context_words: List[str]) -> Tuple[str, str]:
        """Disambiguate: alias-dictionary candidates scored by cosine between
        a context embedding and the candidate-id embedding (north-star
        'mention detect + entity link' stage). Deterministic tie-break by
        canonical id."""
        cands = self.alias_dict[mention.surface]
        if len(cands) == 1:
            return cands[0]
        ctx = _hash_vector(" ".join(w.lower() for w in context_words))
        best = max(
            cands,
            key=lambda c: (float(np.dot(ctx, self._id_vecs[c[0]])), c[0]),
        )
        return best

    def tag_and_link(self, words: List[str]) -> List[Mention]:
        mentions = self.find_mentions(words)
        for m in mentions:
            cid, typ = self.link(m, words)
            m.canonical_id = cid
            m.type = typ
        return mentions
