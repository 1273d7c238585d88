"""CaRB tuple-matching functions.

Semantics-identical to /root/reference/carb/matcher.py:

- ``linient_tuple_match``        (matcher.py:188-263): per-part word
  overlap; multiset matching (each gold word consumes one predicted word);
  'be'-forms equivalence bonus; '.' tokens dropped from predicted args;
  a missing predicted arg for gold arg index < 2 → no match;
- ``binary_linient_tuple_match`` (matcher.py:328-358): binarize args
  (args[1:] joined), plus the said-verb arg-swap leniency.

Matches return ``[precision, recall]`` word-level scores for one
(gold, predicted) pair.
"""

from __future__ import annotations

FORMS_OF_BE = ("be", "is", "am", "are", "was", "were", "been", "being")
SAID_VERBS = ("said", "told", "added", "adds", "says")


class MatchTuple:
    """Minimal (pred, args) view used by the matchers."""

    __slots__ = ("pred", "args")

    def __init__(self, pred, args):
        self.pred = pred
        self.args = list(args)


def linient_tuple_match(ref: MatchTuple, ex: MatchTuple) -> list:
    precision = [0, 0]
    recall = [0, 0]

    predicted_words = ex.pred.split()
    gold_words = ref.pred.split()
    precision[1] += len(predicted_words)
    recall[1] += len(gold_words)

    matching_words = 0
    for w in gold_words:
        if w in predicted_words:
            matching_words += 1
            predicted_words.remove(w)

    if "be" in predicted_words:
        for form in FORMS_OF_BE:
            if form in gold_words:
                matching_words += 1
                predicted_words.remove("be")
                break

    if matching_words == 0:
        return [0, 0]  # rel mismatch → no match at all (matcher.py:215)

    precision[0] += matching_words
    recall[0] += matching_words

    for i in range(len(ref.args)):
        gold_words = ref.args[i].split()
        recall[1] += len(gold_words)
        if len(ex.args) <= i:
            if i < 2:
                return [0, 0]
            continue
        predicted_words = [w for w in ex.args[i].split() if w != "."]
        precision[1] += len(predicted_words)
        matching_words = 0
        for w in gold_words:
            if w in predicted_words:
                matching_words += 1
                predicted_words.remove(w)
        precision[0] += matching_words
        recall[0] += matching_words

    prec = precision[0] / precision[1] if precision[1] else 0
    rec = recall[0] / recall[1] if recall[1] else 0
    return [prec, rec]


def _binarize(t: MatchTuple) -> MatchTuple:
    if len(t.args) >= 2:
        return MatchTuple(t.pred, [t.args[0], " ".join(t.args[1:])])
    return t


def binary_linient_tuple_match(ref: MatchTuple, ex: MatchTuple) -> list:
    r = _binarize(ref)
    e = _binarize(ex)
    straight = linient_tuple_match(r, e)
    if not any(v in ref.pred for v in SAID_VERBS):
        return straight
    if len(ex.args) >= 2:
        e_rev = MatchTuple(ex.pred, [" ".join(ex.args[1:]), ex.args[0]])
    else:
        e_rev = ex
    return max(straight, linient_tuple_match(r, e_rev))
