"""Differential tests: training-label construction vs the reference's
data_preprocessing functions (AST-extracted)."""

import random
import types

import pytest

from openie_with_entities_ray.functions.labelgen import (
    build_tags,
    make_extraction,
    parse_openie_line,
)

from reference_oracle import REFERENCE_DIR, _extract, reference_available


def _load_reference_labelgen():
    import difflib
    import re

    ns = {
        "re": re,
        "difflib": difflib,
        "ipdb": types.SimpleNamespace(set_trace=lambda: None),
    }
    exec(
        _extract(
            f"{REFERENCE_DIR}/data_preprocessing.py",
            {
                "seq_in_seq", "starts_with", "label_arg2", "label_arg",
                "label_is_of_relations", "label_multiple_arg1",
                "label_multiple_rel", "label_location", "label_time",
                "get_extraction", "parse_result_text",
            },
        ),
        ns,
    )
    return types.SimpleNamespace(**ns)


def _reference_tags(ref, sentence, tup):
    ext = ref.get_extraction(sentence, tup)
    ref.label_arg2(ext)
    ref.label_arg(ext, "rel")
    ref.label_arg(ext, "arg1")
    ref.label_is_of_relations([ext])
    ref.label_multiple_arg1([ext])
    ref.label_multiple_rel([ext])
    ref.label_location([ext])
    ref.label_time([ext])
    return ext["tags"]


def _our_tags(sentence, tup):
    confidence, arg1, arg2, args, time_args, loc_args, rel = tup
    ext = make_extraction(
        sentence, confidence, arg1, rel, arg2,
        args=args, loc_args=loc_args, time_args=time_args,
    )
    build_tags(ext)
    return ext["tags"]


CASES = [
    # (sentence, (conf, arg1, arg2, args, time_args, loc_args, rel))
    ("Alice founded Acme in Tokyo",
     (0.9, "Alice", "Acme", [], [], ["in Tokyo"], "founded")),
    ("Alice founded Acme in Tokyo",
     (0.9, "Alice", "Acme", [], ["in Tokyo"], [], "founded")),
    ("Bob is the CEO of Globex",
     (0.8, "Bob", "Globex", [], [], [], "[is] the CEO [of]")),
    ("Bob comes from Texas",
     (0.8, "Bob", "Texas", [], [], [], "[is] coming [from]")),
    ("Paris is a city", (0.7, "Paris", "a city", [], [], [], "[is]")),
    # ambiguous arg1 (two 'Alice' occurrences)
    ("Alice met Alice near Acme",
     (0.6, "Alice", "Acme", [], [], [], "met near")),
    # gappy rel ('was defeated ... by')
    ("the army was defeated quickly by the enemy",
     (0.5, "the army", "the enemy", [], [], [], "was defeated by")),
    # empty arg2
    ("Bob slept", (0.4, "Bob", "", [], [], [], "slept")),
    # multiple rel occurrences resolved by arg positions
    ("run Bob run fast run",
     (0.3, "Bob", "fast", [], [], [], "run")),
]


@pytest.mark.skipif(not reference_available(), reason="reference absent")
@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_labelgen_differential_cases(case_idx):
    ref = _load_reference_labelgen()
    sentence, tup = CASES[case_idx]
    assert _our_tags(sentence, tup) == _reference_tags(ref, sentence, tup)


@pytest.mark.skipif(not reference_available(), reason="reference absent")
def test_labelgen_differential_random():
    ref = _load_reference_labelgen()
    rng = random.Random(314)
    vocab = ["Alice", "Bob", "met", "the", "dog", "in", "Tokyo", "fast", "ran"]
    checked = 0
    for _ in range(400):
        n = rng.randint(3, 10)
        words = [rng.choice(vocab) for _ in range(n)]
        sentence = " ".join(words)
        # pick spans from the sentence for args so matches are plausible
        def span():
            i = rng.randrange(n)
            j = min(n, i + rng.randint(1, 3))
            return " ".join(words[i:j])

        tup = (0.5, span(), span(), [], [], [], span())
        try:
            expected = _reference_tags(ref, sentence, tup)
        except AssertionError:
            continue  # reference hit an internal assert; skip the case
        assert _our_tags(sentence, tup) == expected, (sentence, tup)
        checked += 1
    assert checked > 300


@pytest.mark.skipif(not reference_available(), reason="reference absent")
def test_parse_openie_line_differential():
    ref = _load_reference_labelgen()
    lines = [
        "0.95 (Alice; founded; Acme Corp)",
        "0.80 (Bob; is; T:the CEO; L:in Tokyo; extra)",
        "0.70 (X; rel; L:somewhere)",
    ]
    for line in lines:
        assert parse_openie_line(line) == ref.parse_result_text(line)
    assert parse_openie_line("not an extraction") is None
