"""CaRB tuple-matching functions.

Semantics-identical to /root/reference/carb/matcher.py:

- ``linient_tuple_match``        (matcher.py:188-263): per-part word
  overlap; multiset matching (each gold word consumes one predicted word);
  'be'-forms equivalence bonus; '.' tokens dropped from predicted args;
  a missing predicted arg for gold arg index < 2 → no match;
- ``binary_linient_tuple_match`` (matcher.py:328-358): binarize args
  (args[1:] joined), plus the said-verb arg-swap leniency;
- ``tuple_match``                (matcher.py:136-185): stricter variant —
  no 'be'-forms bonus, no '.' filtering, zero-match on arg<2 → reject;
- ``binary_tuple_match``         (matcher.py:361-374): binarize, strict;
- ``simple_tuple_match``         (matcher.py:266-305): binarizes the
  tuples IN PLACE (reference quirk preserved on copies), stops at the
  first missing predicted arg, never rejects on zero overlap;
- ``bow_match`` / ``pred_match`` (matcher.py:10-48): bag-of-words /
  predicate equality after lowercasing + stopword removal;
- ``arg_match``                  (matcher.py:50-72): the reference
  iterates CHARACTERS of the joined arg strings (``for w1 in sRef`` over
  a str), so the 'coverage' is a quadratic character-pair count — quirk
  preserved exactly;
- ``lexical_match``              (matcher.py:113-133): same quadratic
  count over bag-of-words tokens.

The binary-valued matchers return True/False as the reference does;
:data:`MATCHERS` wraps everything to a ``[precision, recall]`` pair for
the CaRB scorer (bool → [1,1]/[0,0] — the reference's active scorer
would crash on its own bool matchers, carb.py:119 vs matcher.py:29).
``ignoreStopwords/ignoreCase`` are fixed True as at the reference's one
call site (carb.py:119). The stopword list is the public NLTK English
list + ASCII punctuation (matcher.py:385), vendored as a literal since
nltk is absent here. ``bleu_match`` (registered as ``bleuMatch``) is a
stdlib BLEU reimplementation in this file; ``bert_score_match`` is the
one unported matcher — it needs a BERT model, env-blocked even as an
optional dep in the reference (carb/matcher.py, registry
carb/carb.py:480-505).
"""

from __future__ import annotations

import string

FORMS_OF_BE = ("be", "is", "am", "are", "was", "were", "been", "being")
SAID_VERBS = ("said", "told", "added", "adds", "says")

# nltk.corpus.stopwords.words('english') — public list, vendored because
# nltk is not installed in this environment (matcher.py:385)
NLTK_STOPWORDS_EN = (
    "i me my myself we our ours ourselves you you're you've you'll you'd "
    "your yours yourself yourselves he him his himself she she's her hers "
    "herself it it's its itself they them their theirs themselves what "
    "which who whom this that that'll these those am is are was were be "
    "been being have has had having do does did doing a an the and but "
    "if or because as until while of at by for with about against "
    "between into through during before after above below to from up "
    "down in out on off over under again further then once here there "
    "when where why how all any both each few more most other some such "
    "no nor not only own same so than too very s t can will just don "
    "don't should should've now d ll m o re ve y ain aren aren't couldn "
    "couldn't didn didn't doesn doesn't hadn hadn't hasn hasn't haven "
    "haven't isn isn't ma mightn mightn't mustn mustn't needn needn't "
    "shan shan't shouldn shouldn't wasn wasn't weren weren't won won't "
    "wouldn wouldn't"
).split()

STOPWORDS = frozenset(NLTK_STOPWORDS_EN) | frozenset(string.punctuation)


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


# ---------------------------------------------------------------------------
# the rest of the reference registry (carb.py:480-505 dispatch)


def _bow(t: MatchTuple) -> str:
    """extraction.bow() over plain-string elements (extraction.py:113)."""
    return " ".join([t.pred] + list(t.args))


def _remove_stopwords(words):
    return [w for w in words if w.lower() not in STOPWORDS]


def bow_match(ref: MatchTuple, ex: MatchTuple) -> bool:
    """matcher.py:10-29 with the call-site flags (lower + stopwords)."""
    s1 = _bow(ref).lower()
    s2 = _bow(ex).lower()
    return sorted(_remove_stopwords(s1.split(" "))) == sorted(
        _remove_stopwords(s2.split(" "))
    )


def pred_match(ref: MatchTuple, ex: MatchTuple) -> bool:
    """matcher.py:31-48."""
    s1 = ref.pred.lower()
    s2 = ex.pred.lower()
    return _remove_stopwords(s1.split(" ")) == _remove_stopwords(
        s2.split(" ")
    )


LEXICAL_THRESHOLD = 0.5  # matcher.py:382


def arg_match(ref: MatchTuple, ex: MatchTuple) -> bool:
    """matcher.py:50-72 ('--exactMatch'): quadratic CHARACTER-pair count
    (the reference iterates the joined strings char by char); flags
    unused in the body."""
    s_ref = " ".join(ref.args)
    s_ex = " ".join(ex.args)
    count = 0
    for w1 in s_ref:
        for w2 in s_ex:
            if w1 == w2:
                count += 1
    coverage = count / len(s_ref) if s_ref else 0.0
    return coverage > LEXICAL_THRESHOLD


def lexical_match(ref: MatchTuple, ex: MatchTuple) -> bool:
    """matcher.py:113-133: quadratic word-pair count over bows."""
    s_ref = _bow(ref).split(" ")
    s_ex = _bow(ex).split(" ")
    count = 0
    for w1 in s_ref:
        for w2 in s_ex:
            if w1 == w2:
                count += 1
    coverage = count / len(s_ref) if s_ref else 0.0
    return coverage > LEXICAL_THRESHOLD


BLEU_THRESHOLD = 0.4  # matcher.py:381


def _sentence_bleu(reference, hypothesis, max_n: int = 4) -> float:
    """``nltk.translate.bleu_score.sentence_bleu`` DEFAULT semantics
    (weights 4x0.25, method0 smoothing, brevity penalty) on the stdlib —
    nltk is an optional heavy dep even in the reference and is absent
    here, so the algorithm is reimplemented from the published BLEU
    definition the nltk defaults encode:

    - modified n-gram precision with reference clipping; denominator
      floored at 1 (nltk's ``modified_precision``),
    - zero unigram matches → 0.0 outright (nltk ``corpus_bleu``),
    - method0 smoothing: any other zero precision becomes
      ``sys.float_info.min`` so the log-space geometric mean yields ~0
      instead of raising — including the famous quirk that a PERFECT
      sub-4-word hypothesis scores ~0 because p_4 has no 4-grams,
    - brevity penalty ``exp(1 - r/h)`` for h <= r (h == 0 → 0)."""
    import math
    import sys
    from collections import Counter

    def ngrams(seq, n):
        return Counter(
            tuple(seq[i : i + n]) for i in range(len(seq) - n + 1)
        )

    p = []
    for n in range(1, max_n + 1):
        hyp = ngrams(hypothesis, n)
        ref = ngrams(reference, n)
        clipped = sum(min(c, ref[g]) for g, c in hyp.items())
        p.append(clipped / max(1, sum(hyp.values())))
    if p[0] == 0:
        return 0.0
    h, r = len(hypothesis), len(reference)
    if h > r:
        bp = 1.0
    elif h == 0:
        bp = 0.0
    else:
        bp = math.exp(1 - r / h)
    s = math.fsum(
        0.25 * math.log(x if x > 0 else sys.float_info.min) for x in p
    )
    return bp * math.exp(s)


def bleu_match(ref: MatchTuple, ex: MatchTuple) -> bool:
    """matcher.py:106-112 ('--bleuMatch'): sentence BLEU over the bows
    (no lowercasing — the reference passes the raw bow strings)."""
    return (
        _sentence_bleu(_bow(ref).split(" "), _bow(ex).split(" "))
        > BLEU_THRESHOLD
    )


def tuple_match(ref: MatchTuple, ex: MatchTuple):
    """matcher.py:136-185 ('--strictMatch'): like linient but no
    'be'-forms bonus, no '.' filter, and a zero-overlap arg at index < 2
    rejects. Returns [prec, rec] or False."""
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
    if matching_words == 0:
        return False
    precision[0] += matching_words
    recall[0] += matching_words

    for i in range(len(ref.args)):
        gold_words = ref.args[i].split()
        recall[1] += len(gold_words)
        if len(ex.args) <= i:
            if i < 2:
                return False
            continue
        predicted_words = ex.args[i].split()
        precision[1] += len(predicted_words)
        matching_words = 0
        for w in gold_words:
            if w in predicted_words:
                matching_words += 1
                predicted_words.remove(w)
        if matching_words == 0 and i < 2:
            return False
        precision[0] += matching_words
        recall[0] += matching_words

    prec = precision[0] / precision[1] if precision[1] else 0
    rec = recall[0] / recall[1] if recall[1] else 0
    return [prec, rec]


def binary_tuple_match(ref: MatchTuple, ex: MatchTuple):
    """matcher.py:361-374: binarize both sides, then strict tuple_match."""
    return tuple_match(_binarize(ref), _binarize(ex))


def simple_tuple_match(ref: MatchTuple, ex: MatchTuple) -> list:
    """matcher.py:266-305: binarize (the reference mutates its inputs —
    done on copies here), stop at the first missing predicted arg, no
    zero-overlap rejection. The reference divides unguarded
    (ZeroDivisionError on an empty predicted tuple); an engine must not
    die on data, so empty denominators score 0."""
    ref = MatchTuple(ref.pred, [ref.args[0] if ref.args else "",
                                " ".join(ref.args[1:])])
    ex = MatchTuple(ex.pred, [ex.args[0] if ex.args else "",
                              " ".join(ex.args[1:])])

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
    precision[0] += matching_words
    recall[0] += matching_words

    for i in range(len(ref.args)):
        gold_words = ref.args[i].split()
        recall[1] += len(gold_words)
        if len(ex.args) <= i:
            break
        predicted_words = ex.args[i].split()
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


def _as_score(fn):
    """Adapt a reference matcher to the CaRB scorer's [prec, rec] shape:
    bool → [1,1]/[0,0]; tuple_match's False → [0,0]."""

    def score(ref, ex):
        out = fn(ref, ex)
        if out is True:
            return [1.0, 1.0]
        if out is False or out is None:
            return [0.0, 0.0]
        return out

    return score


# --matcher registry, names per the reference CLI flags (carb.py:480-505)
MATCHERS = {
    "carb": binary_linient_tuple_match,          # default (no flag)
    "simple": _as_score(simple_tuple_match),     # --simpleMatch
    "exact": _as_score(arg_match),               # --exactMatch
    "pred": _as_score(pred_match),               # --predMatch
    "lexical": _as_score(lexical_match),         # --lexicalMatch
    "bow": _as_score(bow_match),                 # (legacy bowMatch)
    "strict": _as_score(tuple_match),            # --strictMatch
    "binary": _as_score(binary_tuple_match),     # --binaryMatch
    "bleu": _as_score(bleu_match),               # --bleuMatch
}
