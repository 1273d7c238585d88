"""Differential-test harness: load selected *pure* functions from the
read-only reference checkout at /root/reference and expose them as an
oracle for our kernels.

The reference modules cannot be imported wholesale (they import torch /
flair / spacy and load model weights at import time), so we AST-extract
only the named top-level defs/classes we need and exec them in a minimal
namespace. Nothing is copied into this repository; tests skip gracefully
when the reference checkout is absent.
"""

from __future__ import annotations

import ast
import os
import types

REFERENCE_DIR = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def _extract(path: str, names: set[str]) -> str:
    with open(path, "r", encoding="utf-8") as f:
        src = f.read()
    tree = ast.parse(src)
    chunks = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.ClassDef)) and node.name in names:
            chunks.append(ast.get_source_segment(src, node))
    found = len(chunks)
    assert found == len(names), f"extracted {found}, wanted {names} from {path}"
    return "\n\n\n".join(chunks)


def _extract_method(path: str, class_name: str, method: str) -> str:
    with open(path, "r", encoding="utf-8") as f:
        src = f.read()
    tree = ast.parse(src)
    for node in tree.body:
        if isinstance(node, ast.ClassDef) and node.name == class_name:
            for sub in node.body:
                if isinstance(sub, ast.FunctionDef) and sub.name == method:
                    seg = ast.get_source_segment(src, sub)
                    # dedent one level
                    lines = seg.splitlines()
                    indent = len(lines[0]) - len(lines[0].lstrip())
                    return "\n".join(line[indent:] for line in lines)
    raise AssertionError(f"{class_name}.{method} not found in {path}")


_cache: dict = {}


def load_conj_oracle():
    """metric.get_coords + data.coords_to_sentences (and helpers)."""
    if "conj" in _cache:
        return _cache["conj"]
    import difflib
    import re
    import warnings

    ns: dict = {"warnings": warnings, "re": re, "difflib": difflib}
    exec(
        _extract(os.path.join(REFERENCE_DIR, "metric.py"), {"Coordination", "get_coords"}),
        ns,
    )
    exec(
        _extract(
            os.path.join(REFERENCE_DIR, "data.py"),
            {
                "coords_to_sentences",
                "get_tree",
                "is_parent",
                "get_sentences",
                "remove_unbreakable_conjuncts",
            },
        ),
        ns,
    )
    mod = types.SimpleNamespace(**ns)
    _cache["conj"] = mod
    return mod


def load_ent_tags_oracle():
    """data.ent_tags + data.char_index_to_word_index — the span→word
    mapping behind the reference's spaCy NER path (pure functions; the
    flair variant differs only in reading .text off token objects)."""
    if "ent_tags" in _cache:
        return _cache["ent_tags"]
    ns: dict = {}
    exec(
        _extract(
            os.path.join(REFERENCE_DIR, "data.py"),
            {"ent_tags", "char_index_to_word_index"},
        ),
        ns,
    )
    mod = types.SimpleNamespace(**ns)
    _cache["ent_tags"] = mod
    return mod


class _FakeExtraction:
    def __init__(self, pred, head_pred_index, sent, confidence, index):
        self.pred = pred
        self.sent = sent
        self.confidence = confidence
        self.args = []

    def addArg(self, arg):
        self.args.append(arg)


def load_triple_oracle(no_lt: bool = False):
    """metric.Carb._process_extraction as a standalone callable.

    Returns fn(labels_list, words, score) -> object with .pred/.args.
    """
    key = ("triple", no_lt)
    if key in _cache:
        return _cache[key]
    import re

    import numpy as np

    ns: dict = {"re": re, "Extraction": _FakeExtraction}
    exec(
        _extract_method(
            os.path.join(REFERENCE_DIR, "metric.py"), "Carb", "_process_extraction"
        ),
        ns,
    )
    method = ns["_process_extraction"]
    fake_self = types.SimpleNamespace(
        hparams=types.SimpleNamespace(no_lt=no_lt)
    )

    def call(labels, words, score):
        arr = np.asarray(labels, dtype=np.int64)
        return method(fake_self, arr, words, score)

    _cache[key] = call
    return call


def load_matcher_oracle(stopwords):
    """AST-extract the reference Matcher's static methods (carb/matcher.py)
    into a shim class. ``stopwords`` is injected (the reference builds its
    list from nltk at import time, which is unavailable here)."""
    key = "matcher"
    if key in _cache:
        return _cache[key]
    from copy import copy

    path = os.path.join(REFERENCE_DIR, "carb", "matcher.py")
    g: dict = {"copy": copy}
    methods = {}
    for name in (
        "bowMatch", "predMatch", "argMatch", "lexicalMatch",
        "tuple_match", "linient_tuple_match", "simple_tuple_match",
        "binary_tuple_match", "binary_linient_tuple_match",
        "removeStopwords",
    ):
        exec(_extract_method(path, "Matcher", name), g)
        methods[name] = g[name]

    cls = type(
        "Matcher",
        (),
        {
            **{k: staticmethod(v) for k, v in methods.items()},
            "LEXICAL_THRESHOLD": 0.5,
            "BLEU_THRESHOLD": 0.4,
            "F1_THRESHOLD": 0.25,
            "PRECISION_THRESHOLD": 0.8,
            "stopwords": list(stopwords),
        },
    )
    g["Matcher"] = cls  # late-bind the intra-class references

    class RefExt:
        """Just enough of carb.oie_readers.extraction.Extraction for the
        matchers: plain-string pred/args, bow(), elementToStr()."""

        def __init__(self, pred, args):
            self.pred = pred
            self.args = list(args)

        def elementToStr(self, elem):
            return str(elem)

        def bow(self):
            return " ".join([self.pred] + [str(a) for a in self.args])

    _cache[key] = (cls, RefExt)
    return _cache[key]
