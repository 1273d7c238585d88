"""Golden + differential tests for the triple-decode / dedup / top-k kernels."""

import random

import pytest

from openie_with_entities_ray.functions.triples import (
    MARKERS,
    Triple,
    decode_sentence_triples,
    decode_triple,
    dedup_exact,
    ext_to_allennlp,
    ext_to_string,
    top_k,
)

from reference_oracle import load_triple_oracle, reference_available


def words_of(sentence):
    return sentence.split() + list(MARKERS)


def test_basic_decode():
    words = words_of("Alice founded Acme .")
    labels = [1, 2, 3, 0, 0, 0, 0]
    t = decode_triple(labels, words)
    assert (t.arg1, t.rel, t.arg2) == ("Alice", "founded", "Acme")


def test_rel_case_markers():
    words = words_of("Alice , the CEO .")
    # REL on [unused1] → pred 'is ' (trailing space preserved, model.py:575)
    labels = [1, 0, 3, 3, 0, 2, 0, 0]
    t = decode_triple(labels, words)
    assert t.rel == "is "
    assert (t.arg1, t.arg2) == ("Alice", "the CEO")
    # REL on [unused2] → 'is ... of'
    labels = [1, 0, 2, 3, 0, 0, 2, 0]
    t = decode_triple(labels, words)
    assert t.rel == "is the of"
    # REL on [unused3] → 'is ... from'
    labels = [1, 0, 2, 3, 0, 0, 0, 2]
    t = decode_triple(labels, words)
    assert t.rel == "is the from"


def test_loc_time_folding():
    words = words_of("Bob worked in Tokyo .")
    labels = [1, 2, 4, 4, 0, 0, 0, 0]
    t = decode_triple(labels, words)
    assert t.arg2 == "in Tokyo"
    t = decode_triple(labels, words, no_lt=True)
    assert t.arg2 == ""


def test_depth_loop_stops_at_zero_row():
    rows = [[1, 2, 3, 0, 0, 0, 0], [0] * 7, [1, 2, 3, 0, 0, 0, 0]]
    out = decode_sentence_triples(rows, [0.9, 0.8, 0.7], "Alice founded Acme .")
    assert len(out) == 1 and out[0][0] == 0


def test_validity_filter():
    rows = [[0, 2, 3, 0, 0, 0, 0], [1, 0, 3, 0, 0, 0, 0]]
    out = decode_sentence_triples(rows, [0.9, 0.8], "Alice founded Acme .")
    assert out == []  # no arg1 / no rel respectively


def test_dedup_first_wins_and_topk_stable():
    a = Triple("A", "r", "B", 0.5)
    b = Triple("A", "r", "B", 0.9)  # duplicate key, later → dropped
    c = Triple("C", "r", "D", 0.5)
    kept = dedup_exact([a, b, c])
    assert kept == [a, c]
    # stable sort: equal confidences keep encounter order
    assert top_k([a, c], 2) == [a, c]
    assert top_k([a, c], 1) == [a]


def test_renderers():
    t = Triple("Alice", "founded", "Acme", 0.87)
    assert ext_to_string(t) == "0.87: (Alice; founded; Acme)"
    assert (
        ext_to_allennlp("Alice founded Acme .", t)
        == "Alice founded Acme .\t<arg1> Alice </arg1> <rel> founded </rel> "
        "<arg2> Acme </arg2>\t0.87"
    )


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
@pytest.mark.parametrize("no_lt", [False, True])
def test_differential_random_labels(no_lt):
    ref = load_triple_oracle(no_lt=no_lt)
    rng = random.Random(777)
    for trial in range(800):
        n = rng.randint(1, 20)
        sentence = " ".join(f"w{i}" for i in range(n))
        words = words_of(sentence)
        labels = [rng.choice([0, 0, 1, 1, 2, 2, 3, 3, 4, 5]) for _ in words]
        ours = decode_triple(labels, words, no_lt=no_lt)
        theirs = ref(labels, words, 0.5)
        assert ours.rel == theirs.pred, (labels, words)
        assert ours.arg1 == theirs.args[0], (labels, words)
        assert ours.arg2 == theirs.args[1], (labels, words)
