"""Training-label construction (O18): align bootstrapped extractions to
token sequences, producing per-word tag rows for grid-labeler training.

Semantics of /root/reference/data_preprocessing.py:16-277 —

- :func:`tag_arg2`     (label_arg2, dp.py:16-74): try 11 concatenation
  orderings of arg2/args/loc/time token lists; the first ordering that
  occurs exactly once contiguously in the sentence is tagged ARG2;
- :func:`tag_arg`      (label_arg, dp.py:77-93): contiguous single
  occurrence, else a gap-tolerant SequenceMatcher alignment that must
  consume the argument fully in order;
- :func:`tag_is_of_relations` (dp.py:96-173): '[is]'/'[of]'/'[from]'
  synthetic relations tag the marker tokens [unused1|2|3] as REL;
- :func:`tag_multiple_arg1` / :func:`tag_multiple_rel` (dp.py:176-253):
  ambiguous occurrences resolved by distance to the already-tagged REL
  (resp. ARG1 + ARG2) span start;
- :func:`tag_location` / :func:`tag_time` (dp.py:256-277): single
  loc/time argument tagged LOC/TIME when contiguous;
- :func:`parse_openie_line` (dp.py:331-370): the bootstrapped OpenIE-4/5
  line format ``conf (arg1; rel; arg2[; T:…; L:…; …])``.

Everything is a pure kernel over one extraction dict; the Ray shape is a
``map_batches`` over (sentence, extraction-line) rows grouped per
sentence — offline training-data tooling, not the inference path.
"""

from __future__ import annotations

import difflib
import re
from typing import List, Optional


def count_subseq(sub: List[str], full: List[str]) -> int:
    """NON-overlapping occurrences of ``sub`` as a contiguous token run —
    the reference counts via ``str(full).count(str(sub))`` (dp.py:8-9),
    which is non-overlapping ('Tokyo Tokyo Tokyo' contains 'Tokyo Tokyo'
    once, not twice)."""
    if not sub:
        return 0
    count = 0
    i = 0
    m = len(sub)
    while i <= len(full) - m:
        if full[i : i + m] == sub:
            count += 1
            i += m
        else:
            i += 1
    return count


def _contiguous_match(sub: List[str], full: List[str]):
    """SequenceMatcher blocks for a clean single contiguous match, else
    None (dp.py label_extraction precondition: two blocks, first covers
    all of sub)."""
    matches = difflib.SequenceMatcher(None, sub, full).get_matching_blocks()
    if (
        len(matches) == 2
        and matches[0].a == 0
        and matches[0].size == matches[1].a
        and matches[1].size == 0
    ):
        return matches
    return None


def _gappy_match(sub: List[str], full: List[str]):
    """Gap-tolerant alignment that consumes sub fully, in order
    (dp.py:87-93)."""
    matches = difflib.SequenceMatcher(None, sub, full).get_matching_blocks()
    if (
        len(matches) > 2
        and matches[0].a == 0
        and all(
            matches[i].a == matches[i - 1].a + matches[i - 1].size
            for i in range(1, len(matches) - 1)
        )
        and matches[-2].a + matches[-2].size == matches[-1].a
    ):
        return matches
    return None


def make_extraction(sentence: str, confidence: float, arg1: str, rel: str,
                    arg2: str, args=(), loc_args=(), time_args=()):
    """dp.py:289-328 (get_extraction): the mutable alignment record."""
    text = sentence.strip() + " [unused1] [unused2] [unused3]"
    tokens = text.split()
    args = [a for a in args if a.strip() != ""] if args else []
    ext = {
        "tokens": tokens,
        "tags": ["NONE"] * len(tokens),
        "arg1": arg1.strip(),
        "arg1_tokens": arg1.strip().split(),
        "arg1_tagged": False,
        "rel": rel.strip(),
        "rel_tokens": rel.strip().split(),
        "rel_tagged": False,
        "arg2": arg2.strip(),
        "arg2_tokens": arg2.strip().split() if arg2.strip() else [],
        "arg2_tagged": False,
        "args": list(args),
        "loc_args": list(loc_args),
        "time_args": list(time_args),
        "confidence": confidence,
    }
    ext["args_tokens"] = [t for a in ext["args"] for t in a.strip().split()]
    ext["loc_args_tokens"] = [
        t for a in ext["loc_args"] for t in a.strip().split()
    ]
    ext["time_args_tokens"] = [
        t for a in ext["time_args"] for t in a.strip().split()
    ]
    return ext


def _apply_blocks(ext, matches, tag: str) -> None:
    for m in matches:
        ext["tags"][m.b : m.b + m.size] = [tag] * m.size


def tag_arg(ext, arg: str) -> None:
    """dp.py:77-93: ARG1/ARG2 by contiguous single match, else gappy."""
    sub = ext[arg + "_tokens"]
    occurrences = count_subseq(sub, ext["tokens"])
    if occurrences == 1:
        matches = _contiguous_match(sub, ext["tokens"])
        if matches:
            ext[arg + "_tagged"] = True
            _apply_blocks(ext, matches[:1], arg.upper())
    elif occurrences == 0:
        matches = _gappy_match(sub, ext["tokens"])
        if matches:
            ext[arg + "_tagged"] = True
            _apply_blocks(ext, matches, arg.upper())


# the 11 fallback orderings of dp.py:28-74, in reference order
_ARG2_ORDERINGS = (
    ("arg2_tokens", "args_tokens", "loc_args_tokens", "time_args_tokens"),
    ("arg2_tokens", "args_tokens", "time_args_tokens", "loc_args_tokens"),
    ("arg2_tokens", "args_tokens", "time_args_tokens"),
    ("arg2_tokens", "args_tokens", "loc_args_tokens"),
    ("arg2_tokens", "time_args_tokens", "loc_args_tokens"),
    ("arg2_tokens", "loc_args_tokens", "time_args_tokens"),
    ("arg2_tokens", "time_args_tokens"),
    ("arg2_tokens", "loc_args_tokens"),
    ("time_args_tokens", "loc_args_tokens"),
    ("loc_args_tokens", "time_args_tokens"),
    ("loc_args_tokens",),
    ("time_args_tokens",),
)


def tag_arg2(ext) -> None:
    """dp.py:16-74: first ordering with exactly one contiguous occurrence
    wins; empty arg2+args+loc+time means trivially tagged."""
    if (
        ext["arg2"] == ""
        and not ext["args_tokens"]
        and not ext["loc_args_tokens"]
        and not ext["time_args_tokens"]
    ):
        ext["arg2_tagged"] = True
        return
    for ordering in _ARG2_ORDERINGS:
        sub = [t for field in ordering for t in ext[field]]
        if count_subseq(sub, ext["tokens"]) == 1:
            matches = _contiguous_match(sub, ext["tokens"])
            if matches:
                ext["arg2_tagged"] = True
                _apply_blocks(ext, matches[:1], "ARG2")
            return


def tag_rel(ext) -> None:
    """Plain relation tagging, same mechanism as tag_arg."""
    tag_arg_like_rel(ext, ext["rel_tokens"])


def tag_arg_like_rel(ext, sub) -> None:
    occurrences = count_subseq(sub, ext["tokens"])
    if occurrences == 1:
        matches = _contiguous_match(sub, ext["tokens"])
        if matches:
            ext["rel_tagged"] = True
            _apply_blocks(ext, matches[:1], "REL")
    elif occurrences == 0:
        matches = _gappy_match(sub, ext["tokens"])
        if matches:
            ext["rel_tagged"] = True
            _apply_blocks(ext, matches, "REL")


def tag_is_of_relations(ext) -> None:
    """dp.py:96-173: synthetic '[is] … [of]/[from]' relations → REL on the
    inner tokens plus the matching marker token."""
    if ext["rel_tagged"] or not ext["rel_tokens"]:
        return
    rel_tokens = ext["rel_tokens"]
    tokens = ext["tokens"]

    def inner_match(sub, marker_offset) -> None:
        if count_subseq(sub, tokens) == 1:
            matches = _contiguous_match(sub, tokens)
            if matches:
                ext["rel_tagged"] = True
                _apply_blocks(ext, matches[:1], "REL")
                ext["tags"][marker_offset] = "REL"
        else:
            matches = _gappy_match(sub, tokens)
            if matches:
                ext["rel_tagged"] = True
                _apply_blocks(ext, matches, "REL")
                ext["tags"][marker_offset] = "REL"

    if ext["rel"] == "[is]":
        ext["rel_tagged"] = True
        ext["tags"][-3] = "REL"  # [unused1]
    elif rel_tokens[0] == "[is]" and rel_tokens[-1] == "[of]":
        if len(rel_tokens) > 2:
            inner_match(rel_tokens[1:-1], -2)  # [unused2]
    elif rel_tokens[0] == "[is]" and rel_tokens[-1] == "[from]":
        if len(rel_tokens) > 2:
            inner_match(rel_tokens[1:-1], -1)  # [unused3]
    elif rel_tokens[0] == "[is]" and len(rel_tokens) > 1:
        inner_match(rel_tokens[1:], -3)  # [unused1]


def _starting_indexes(sub, tokens):
    return [
        j
        for j in range(len(tokens) - len(sub) + 1)
        if tokens[j : j + len(sub)] == sub
    ]


def tag_multiple_arg1(ext) -> None:
    """dp.py:176-201: ambiguous arg1 resolved nearest to the REL start."""
    if (
        ext["rel_tagged"]
        and not ext["arg1_tagged"]
        and count_subseq(ext["arg1_tokens"], ext["tokens"]) > 1
        and "REL" in ext["tags"]
    ):
        rel_idx = ext["tags"].index("REL")
        starts = _starting_indexes(ext["arg1_tokens"], ext["tokens"])
        best = min(starts, key=lambda idx: abs(rel_idx - idx))
        ext["arg1_tagged"] = True
        n = len(ext["arg1_tokens"])
        ext["tags"][best : best + n] = ["ARG1"] * n


def tag_multiple_rel(ext) -> None:
    """dp.py:204-253: ambiguous rel resolved nearest to ARG1 (plus ARG2
    when present)."""
    if not (
        ext["arg1_tagged"]
        and ext["arg2_tagged"]
        and not ext["rel_tagged"]
        and ext["rel_tokens"]
    ):
        return
    rel_tokens = None
    if count_subseq(ext["rel_tokens"], ext["tokens"]) > 1:
        rel_tokens = ext["rel_tokens"]
    elif ext["rel_tokens"][0] == "[is]" and count_subseq(
        ext["rel_tokens"][1:], ext["tokens"]
    ) > 1:
        rel_tokens = ext["rel_tokens"][1:]
    elif (
        ext["rel_tokens"][0] == "[is]"
        and ext["rel_tokens"][-1].startswith("[")
        and count_subseq(ext["rel_tokens"][1:-1], ext["tokens"]) > 1
    ):
        rel_tokens = ext["rel_tokens"][1:-1]
    if not rel_tokens:
        return
    if "ARG1" not in ext["tags"]:
        return
    if ext["arg2"] != "" and "ARG2" not in ext["tags"]:
        return
    arg1_idx = ext["tags"].index("ARG1")
    starts = _starting_indexes(rel_tokens, ext["tokens"])
    if ext["arg2"] == "":
        best = min(starts, key=lambda idx: abs(arg1_idx - idx))
    else:
        arg2_idx = ext["tags"].index("ARG2")
        best = min(
            starts, key=lambda idx: abs(arg1_idx - idx) + abs(arg2_idx - idx)
        )
    ext["rel_tagged"] = True
    n = len(rel_tokens)
    ext["tags"][best : best + n] = ["REL"] * n


def tag_location(ext) -> None:
    """dp.py:256-264: a single loc arg with a contiguous match → LOC."""
    if len(ext["loc_args"]) == 1:
        sub = ext["loc_args"][0].strip().split()
        matches = _contiguous_match(sub, ext["tokens"])
        if matches:
            _apply_blocks(ext, matches[:1], "LOC")


def tag_time(ext) -> None:
    """dp.py:267-274."""
    if len(ext["time_args"]) == 1:
        sub = ext["time_args"][0].strip().split()
        matches = _contiguous_match(sub, ext["tokens"])
        if matches:
            _apply_blocks(ext, matches[:1], "TIME")


def build_tags(ext) -> Optional[List[str]]:
    """Full alignment cascade for one extraction; returns the tag row if
    complete (dp.py:279-287 completeness rule), else None. Pass order is
    the reference's (dp.py:472-499): arg2 → rel → arg1 → is_of →
    multiple_arg1 → multiple_rel → location → time (tags overwrite, so
    order is semantic)."""
    tag_arg2(ext)
    tag_rel(ext)
    tag_arg(ext, "arg1")
    tag_is_of_relations(ext)
    tag_multiple_arg1(ext)
    tag_multiple_rel(ext)
    tag_location(ext)
    tag_time(ext)
    if (
        ext["arg1_tagged"]
        and ext["rel_tagged"]
        and ext["arg2_tagged"]
        and "REL" in ext["tags"]
        and "ARG1" in ext["tags"]
        and (ext["arg2"] == "" or "ARG2" in ext["tags"])
    ):
        return ext["tags"]
    return None


_OPENIE_LINE = re.compile(r"\d\.\d\d\s\(.*\)")
_OPENIE_CTX = re.compile(r"\d\.\d\d\sContext\(.*\)\:")


def parse_openie_line(text: str):
    """dp.py:331-370: one bootstrapped OpenIE-4/5 result line →
    (confidence, arg1, arg2, args, time_args, loc_args, rel) or None."""
    if _OPENIE_LINE.match(text):
        confidence = float(text.split()[0])
        body = re.sub(r"\A\d.\d\d\s", "", text)[1:-1].split(";")
    elif _OPENIE_CTX.match(text):
        confidence = float(text.split()[0])
        body = re.sub(r"\A\d.\d\d\sContext\(.*\)\:", "", text)[1:-1].split(";")
    else:
        return None
    if len(body) < 3:
        return None
    arg1 = body[0].strip()
    rel = body[1].strip()
    third = body[2].strip()
    arg2 = third[2:] if third.startswith(("T:", "L:")) else third
    args, time_args, loc_args = [], [], []
    for token in body[3:]:
        token = token.strip()
        if token.startswith("T:"):
            time_args.append(token[2:])
        elif token.startswith("L:"):
            loc_args.append(token[2:])
        else:
            args.append(token)
    return (confidence, arg1, arg2, args, time_args, loc_args, rel)
