"""Differential fuzz of the CaRB matcher registry against the reference's
own Matcher methods (AST-extracted, tests/reference_oracle.py)."""

import random
import zlib

import pytest

from openie_with_entities_ray.eval.matcher import (
    MATCHERS,
    MatchTuple,
    STOPWORDS,
    arg_match,
    binary_linient_tuple_match,
    binary_tuple_match,
    bow_match,
    lexical_match,
    pred_match,
    simple_tuple_match,
    tuple_match,
)
from reference_oracle import load_matcher_oracle, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout absent"
)

VOCAB = [
    "the", "a", "cat", "dog", "acquired", "founded", "be", "is", "was",
    "said", "told", "Acme", "Corp", ".", "in", "New", "York", "very",
    "by", "it",
]


def _rand_tuple(rng, min_args=0):
    pred = " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 3)))
    n_args = rng.randint(min_args, 3)
    args = [
        " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 4)))
        for _ in range(n_args)
    ]
    return pred, args


def _pairs(n, seed, min_args=0):
    rng = random.Random(seed)
    for _ in range(n):
        yield _rand_tuple(rng, min_args), _rand_tuple(rng, min_args)


def test_matchers_differential_vs_reference():
    Matcher, RefExt = load_matcher_oracle(STOPWORDS)

    cases = [
        ("bowMatch", bow_match, 0),
        ("predMatch", pred_match, 0),
        # reference argMatch divides by len(' '.join(args)) unguarded —
        # fuzz inside its domain (>=1 arg)
        ("argMatch", arg_match, 1),
        ("lexicalMatch", lexical_match, 0),
        ("tuple_match", tuple_match, 0),
        ("binary_tuple_match", binary_tuple_match, 0),
        ("binary_linient_tuple_match", binary_linient_tuple_match, 0),
        # the reference's simple_tuple_match indexes args[0] and divides
        # by the predicted word count unguarded — fuzz inside its domain
        ("simple_tuple_match", simple_tuple_match, 1),
    ]
    for name, ours, min_args in cases:
        ref_fn = getattr(Matcher, name)
        # crc32, not hash(): str hash is salted per process and would
        # make the fuzz corpus irreproducible
        for (gp, ga), (ep, ea) in _pairs(
            400, seed=zlib.crc32(name.encode()), min_args=min_args
        ):
            want = ref_fn(RefExt(gp, ga), RefExt(ep, ea),
                          ignoreStopwords=True, ignoreCase=True)
            got = ours(MatchTuple(gp, ga), MatchTuple(ep, ea))
            assert got == want, (name, gp, ga, ep, ea, got, want)


def test_registry_adapters_score_shape():
    g = MatchTuple("acquired", ["Acme", "Corp"])
    for name, fn in MATCHERS.items():
        out = fn(g, MatchTuple("acquired", ["Acme", "Corp"]))
        assert isinstance(out, list) and len(out) == 2, name
        assert all(0.0 <= v <= 1.0 for v in out), (name, out)


def test_strict_vs_lenient_divergence():
    """'be'-form bonus and '.'-filter exist only in the lenient family."""
    gold = MatchTuple("is", ["cat", "dog"])
    pred = MatchTuple("be", ["cat .", "dog"])
    from openie_with_entities_ray.eval.matcher import linient_tuple_match

    assert linient_tuple_match(gold, pred)[0] > 0
    assert tuple_match(gold, pred) is False  # no be-forms equivalence


def test_sentence_bleu_nltk_default_semantics():
    """Stdlib BLEU vs hand-computed nltk-default values (weights 4x0.25,
    method0 smoothing, brevity penalty)."""
    import math

    from openie_with_entities_ray.eval.matcher import _sentence_bleu

    # >=4-word identical: all precisions 1, bp 1 -> exactly 1.0
    ref = "the cat sat on the mat".split()
    assert _sentence_bleu(ref, list(ref)) == 1.0

    # the nltk method0 quirk: a PERFECT 2-word hypothesis scores ~0
    # because p3/p4 have no n-grams (sys.float_info.min substitution)
    assert _sentence_bleu(["big", "dog"], ["big", "dog"]) < 1e-100

    # mixed case, closed form: p1=5/6, p2=3/5, p3=1/4, p4=min; bp=1 (h==r)
    import sys

    hyp = "the cat is on the mat".split()
    expect = math.exp(
        0.25
        * (
            math.log(5 / 6)
            + math.log(3 / 5)
            + math.log(1 / 4)
            + math.log(sys.float_info.min)
        )
    )
    assert abs(_sentence_bleu(ref, hyp) - expect) < 1e-12

    # zero unigram overlap -> exactly 0 (corpus_bleu early return)
    assert _sentence_bleu(ref, ["x", "y", "z", "w"]) == 0.0

    # brevity penalty: h<r shrinks the score by exp(1-r/h)
    ref2 = "a b c d e f g h".split()
    hyp2 = "a b c d".split()
    p4 = _sentence_bleu(ref2, hyp2)
    assert abs(p4 - math.exp(1 - 8 / 4)) < 1e-12  # precisions all 1


def test_bleu_match_threshold():
    from openie_with_entities_ray.eval.matcher import (
        MatchTuple,
        bleu_match,
    )

    ref = MatchTuple("founded in 1999", ["Acme Corp", "the new factory"])
    # identical bow (8 words) -> BLEU 1 > 0.4
    assert bleu_match(ref, MatchTuple("founded in 1999",
                                      ["Acme Corp", "the new factory"]))
    # disjoint extraction -> 0
    assert not bleu_match(ref, MatchTuple("sold", ["Globex", "shares"]))
    # registry wiring
    from openie_with_entities_ray.eval.matcher import MATCHERS

    assert MATCHERS["bleu"](ref, ref) == [1.0, 1.0]
