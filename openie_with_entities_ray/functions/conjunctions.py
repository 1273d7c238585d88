"""Coordination decode + conjunctive-sentence splitting kernels.

Pure per-sentence functions, semantics-identical to the reference:

- label state machine:   /root/reference/metric.py:204-248  (``get_coords``)
- splitting + tree:      /root/reference/data.py:624-807    (``coords_to_sentences``,
  ``get_tree``, ``is_parent``, ``get_sentences``, ``remove_unbreakable_conjuncts``)

Conj label ids (/root/reference/data.py:410-412):
``{'CP_START': 2, 'CP': 1, 'CC': 3, 'SEP': 4, 'OTHERS': 5, 'NONE': 0}``

These run inside ``map_batches`` UDFs; they never touch Ray APIs.
"""

from __future__ import annotations

CP_NONE, CP, CP_START, CC, SEP, OTHERS = 0, 1, 2, 3, 4, 5

# /root/reference/data.py:789-791
UNBREAKABLE_WORDS = frozenset(
    [
        "between", "among", "sum", "total", "addition", "amount", "value",
        "aggregate", "gross", "mean", "median", "average", "center",
        "equidistant", "middle",
    ]
)

# coordinator words whose coordinations are dropped before splitting
# (/root/reference/data.py:628-631)
DROPPED_COORDINATORS = ("nor", "&")


class Coordination:
    """A coordination structure: coordinator index + conjunct word-spans.

    Mirror of the reference's Coordination (metric.py:69-101): conjuncts are
    (start, end) inclusive word-index tuples sorted by start; the coordinator
    must lie strictly between the first conjunct's end and the last
    conjunct's start.
    """

    __slots__ = ("cc", "conjuncts", "seps", "label")

    def __init__(self, cc, conjuncts, seps=(), label=None):
        conjuncts = tuple(sorted((tuple(c) for c in conjuncts), key=lambda s: s[0]))
        if len(conjuncts) < 2:
            raise ValueError("coordination needs >=2 conjuncts")
        if not (conjuncts[0][1] < cc < conjuncts[-1][0]):
            raise ValueError("coordinator must lie strictly between conjuncts")
        self.cc = cc
        self.conjuncts = conjuncts
        self.seps = tuple(seps)
        self.label = label

    def __eq__(self, other):
        return (
            isinstance(other, Coordination)
            and self.cc == other.cc
            and self.conjuncts == other.conjuncts
        )

    def __repr__(self):
        return f"Coordination(cc={self.cc}, conjuncts={self.conjuncts})"


def decode_coordinations(depth_labels) -> dict:
    """Decode per-depth conj label rows into ``{cc_index: Coordination|None}``.

    Exact state-machine semantics of metric.py:204-248, including:
    - a conjunct closes on any label != CP;
    - a coordination phrase closes on NONE or CP_START, and is kept only if
      it has >=2 conjuncts with the coordinator strictly inside; a phrase
      that fails the validity check is NOT cleared — it stays open and keeps
      accumulating conjuncts (the ``cp = None`` at metric.py:226 is inside
      the validity branch), so it may still emit at a later NONE/CP_START;
    - no flush at end-of-row (a phrase still open when the row ends is lost);
    - a CC label with no open phrase records ``None`` at that index;
    - later depths overwrite earlier entries at the same cc index (dict
      insertion position preserved).
    """
    coords: dict = {}
    for depth, labels in enumerate(depth_labels):
        phrase = None  # {'cc': int, 'conjuncts': [(s,e)...], 'seps': [...]}
        in_conjunct = False
        start = -1
        for i, label in enumerate(labels):
            if label != CP and in_conjunct and phrase is not None:
                in_conjunct = False
                phrase["conjuncts"].append((start, i - 1))
            if label in (CP_NONE, CP_START) and phrase is not None:
                spans = phrase["conjuncts"]
                if len(spans) >= 2 and spans[0][1] < phrase["cc"] < spans[-1][0]:
                    coords[phrase["cc"]] = Coordination(
                        phrase["cc"], spans, phrase["seps"], label=depth
                    )
                    phrase = None  # an *invalid* phrase stays open (see doc)
            if label == CP_NONE:
                continue
            if label == CP:
                if not in_conjunct:
                    in_conjunct = True
                    start = i
            elif label == CP_START:
                phrase = {"cc": -1, "conjuncts": [], "seps": []}
                in_conjunct = True
                start = i
            elif label == CC:
                if phrase is not None:
                    phrase["cc"] = i
                else:
                    coords[i] = None  # coordinating word with no conjuncts
            elif label == SEP:
                if phrase is not None:
                    phrase["seps"].append(i)
            # OTHERS: no action
    return coords


def _remove_unbreakable(coords: dict, words) -> None:
    """Drop coordinations preceded by an 'unbreakable' word.

    data.py:786-807 semantics: walk coordinations in dict order; the guarded
    span for each is [end of previous coordination + 1, first conjunct start
    - 1]; if any unbreakable word falls inside, the coordination dies.
    """
    unbreakable = [i for i, w in enumerate(words) if w.lower() in UNBREAKABLE_WORDS]
    doomed = []
    span_start = 0
    for key in coords:
        span_end = coords[key].conjuncts[0][0] - 1
        for i in unbreakable:
            if span_start <= i <= span_end:
                doomed.append(key)
        span_start = coords[key].conjuncts[-1][-1] + 1
    for key in set(doomed):
        coords.pop(key)


def _is_parent(parent: Coordination, child: Coordination) -> bool:
    """data.py:731-738: one conjunct of *parent* contains *child*'s full span."""
    lo = child.conjuncts[0][0]
    hi = child.conjuncts[-1][-1]
    return any(s <= lo and e >= hi for s, e in parent.conjuncts)


def _containment_tree(coords: dict):
    """data.py:696-728: build parent/child maps with transitive reduction.

    Child lists are shared objects mutated during reduction (smallest lists
    keep their children; larger lists lose them) — replicated so the direct-
    child relation matches the reference byte-for-byte.
    """
    child_map: dict = {}
    lists = []
    for key in coords:
        kids = [k for k in coords if _is_parent(coords[key], coords[k])]
        child_map[key] = kids
        lists.append(kids)
    lists.sort(key=len)
    for i in range(len(lists)):
        for child in lists[i]:
            for j in range(i + 1, len(lists)):
                if child in lists[j]:
                    lists[j].remove(child)
    parent_map: dict = {}
    for key in coords:
        for child in child_map[key]:
            parent_map[child] = key
    roots = [k for k in coords if k not in parent_map]
    return roots, child_map


def _expand_level(sentences, level, coords: dict, all_indices) -> None:
    """data.py:741-783: expand one tree level of coordinations into index sets."""
    for key in level:
        conjuncts = coords[key].conjuncts
        if len(sentences) == 0:
            for s, e in conjuncts:
                sentences.append(list(range(s, e + 1)))
            lo = conjuncts[0][0]
            hi = conjuncts[-1][-1]
            for sent in sentences:
                for i in all_indices:
                    if i < lo or i > hi:
                        sent.append(i)
        else:
            to_add, to_remove = [], []
            for sent in sentences:
                if conjuncts[0][0] in sent:
                    sent.sort()
                    lo = conjuncts[0][0]
                    hi = conjuncts[-1][-1]
                    for s, e in conjuncts:
                        to_add.append(
                            [i for i in sent if s <= i <= e or i < lo or i > hi]
                        )
                    to_remove.append(sent)
            for sent in to_remove:
                sentences.remove(sent)
            sentences.extend(to_add)


def split_on_coordinations(coords: dict, words):
    """Split a sentence into conjunct-expanded sub-sentences.

    data.py:624-692 (``coords_to_sentences``) semantics:
    1. drop ``None`` entries and 'nor'/'&' coordinations;
    2. drop coordinations vetoed by unbreakable words;
    3. collect conjunct word strings (``conj_words``);
    4. build the containment tree and expand level by level (BFS).

    Returns ``(split_sentences, conj_words, sentence_index_lists)``. An empty
    ``split_sentences`` means "no split" (caller emits the original sentence
    as its own single split, run.py:180-187 semantics).
    """
    coords = {
        k: v
        for k, v in coords.items()
        if v is not None and words[v.cc] not in DROPPED_COORDINATORS
    }
    _remove_unbreakable(coords, words)

    conj_words = []
    for key in coords:
        for s, e in coords[key].conjuncts:
            conj_words.append(" ".join(words[s : e + 1]))

    all_indices = list(range(len(words)))
    roots, child_map = _containment_tree(coords)

    sentences: list = []
    queue = list(roots)
    remaining = len(queue)
    promoted = 0
    same_level: list = []
    while queue:
        key = queue.pop(0)
        remaining -= 1
        same_level.append(key)
        for child in child_map[key]:
            queue.append(child)
            promoted += 1
        if remaining == 0:
            _expand_level(sentences, same_level, coords, all_indices)
            remaining, promoted, same_level = promoted, 0, []

    split_sentences = [
        " ".join(words[i] for i in sorted(sent)) for sent in sentences
    ]
    return split_sentences, conj_words, sentences
