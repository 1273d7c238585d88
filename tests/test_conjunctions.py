"""Golden + differential tests for the coordination kernels.

Differential: our decode/split vs the reference's get_coords /
coords_to_sentences (AST-extracted from /root/reference, see
reference_oracle.py) over seeded random label grids.
"""

import random

import pytest

from openie_with_entities_ray.functions.conjunctions import (
    Coordination,
    decode_coordinations,
    split_on_coordinations,
)

from reference_oracle import load_conj_oracle, reference_available


def simplify(coords):
    return {
        k: (None if v is None else (v.cc, tuple((a, b) for a, b in v.conjuncts)))
        for k, v in coords.items()
    }


# --- golden ---------------------------------------------------------------


def test_simple_coordination_decode_and_split():
    # "A , B and C founded D ."
    words = "A , B and C founded D .".split()
    labels = [[2, 4, 1, 3, 1, 0, 0, 0]]
    coords = decode_coordinations(labels)
    assert simplify(coords) == {3: (3, ((0, 0), (2, 2), (4, 4)))}
    splits, conj_words, idx = split_on_coordinations(coords, words)
    assert splits == ["A founded D .", "B founded D .", "C founded D ."]
    assert conj_words == ["A", "B", "C"]
    assert [sorted(s) for s in idx] == [[0, 5, 6, 7], [2, 5, 6, 7], [4, 5, 6, 7]]


def test_nor_coordinator_dropped():
    words = "A nor B left .".split()
    labels = [[2, 3, 1, 0, 0]]
    coords = decode_coordinations(labels)
    assert simplify(coords) == {1: (1, ((0, 0), (2, 2)))}
    splits, conj_words, _ = split_on_coordinations(coords, words)
    assert splits == [] and conj_words == []


def test_unbreakable_veto():
    # "between A and B lies C ." — 'between' precedes the coordination
    words = "between A and B lies C .".split()
    labels = [[0, 2, 3, 1, 0, 0, 0]]
    coords = decode_coordinations(labels)
    assert simplify(coords) == {2: (2, ((1, 1), (3, 3)))}
    splits, conj_words, _ = split_on_coordinations(coords, words)
    assert splits == []


def test_cc_without_phrase_records_none():
    labels = [[0, 3, 0]]
    coords = decode_coordinations(labels)
    assert coords == {1: None}
    splits, conj_words, _ = split_on_coordinations(coords, list("xyz"))
    assert splits == [] and conj_words == []


def test_open_phrase_at_row_end_is_lost():
    # phrase never closed by a 0/2 label → dropped (no flush)
    labels = [[2, 3, 1]]
    assert decode_coordinations(labels) == {}


def test_nested_coordinations_level_order():
    # "A and B plus C or D ." with outer coord containing inner:
    # outer conjuncts (0,2)/(4,6) via depth0; inner (0,0)/(2,2) via depth1
    words = "w0 w1 w2 cc w4 w5 w6 .".split()
    outer = Coordination(3, [(0, 2), (4, 6)], label=0)
    inner = Coordination(1, [(0, 0), (2, 2)], label=1)
    coords = {3: outer, 1: inner}
    splits, conj_words, _ = split_on_coordinations(coords, words)
    # outer split first: [w0 w1 w2 .] and [w4 w5 w6 .]; then inner splits the
    # sentence containing word 0
    assert "w4 w5 w6 ." in splits
    assert "w0 ." in splits and "w2 ." in splits


# --- differential vs reference -------------------------------------------


@pytest.mark.skipif(not reference_available(), reason="reference checkout absent")
def test_differential_random_grids():
    ref = load_conj_oracle()
    rng = random.Random(4242)
    mismatches = 0
    for trial in range(800):
        n = rng.randint(4, 28)
        depths = rng.randint(1, 3)
        # biased label distribution so real coordinations appear
        labels = [
            [rng.choice([0, 0, 0, 1, 1, 1, 2, 3, 4, 5]) for _ in range(n)]
            for _ in range(depths)
        ]
        words = []
        for i in range(n):
            r = rng.random()
            if r < 0.08:
                words.append(rng.choice([",", ".", "nor", "&", "and"]))
            elif r < 0.13:
                words.append(rng.choice(sorted(["between", "sum", "average"])))
            else:
                words.append(f"w{i}")

        ours = decode_coordinations(labels)
        theirs = ref.get_coords([list(row) for row in labels])
        assert simplify(ours) == {
            k: (None if v is None else (v.cc, tuple(v.conjuncts)))
            for k, v in theirs.items()
        }, (labels, words)

        ours_split = split_on_coordinations(ours, words)
        theirs_split = ref.coords_to_sentences(dict(theirs), words)
        assert ours_split[0] == theirs_split[0], (labels, words)
        assert ours_split[1] == theirs_split[1], (labels, words)
        assert [sorted(s) for s in ours_split[2]] == [
            sorted(s) for s in theirs_split[2]
        ], (labels, words)
