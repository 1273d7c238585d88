"""CaRB-style benchmark: gold vs predicted extraction sets → PR sweep,
AUC, optimal F1 (A4/J3).

Implements the reference's "OPTIMISED GLOBAL MATCH" strategy
(/root/reference/carb/carb.py:62-314, strategy='sm'):

- sentence keys normalized by removing spaces, PTB-unescaping brackets and
  stripping punctuation (carb.py:393-415);
- per sentence, an all-pairs (gold x predicted) score matrix from the
  matching function;
- thresholds = distinct predicted confidences (ascending); for each
  threshold range: recall numerator = per-gold max recall over surviving
  predictions; precision numerator = greedy one-to-one max-precision
  matching; denominators = #surviving predictions / #gold;
- AUC on the PR curve with the (recall 0, precision 1) anchor appended.

The per-sentence kernel is pure, so the distributed form is a
``groupby(sentence_key)`` co-group + this kernel + a global sum — the
driver-side version here is used for eval-set-sized inputs.
"""

from __future__ import annotations

import re
import string

import numpy as np

from .matcher import MatchTuple, binary_linient_tuple_match

_PUNCT_RE = re.compile("[%s]" % re.escape(string.punctuation))
_PTB_ESCAPES = [
    ("(", "-LRB-"), (")", "-RRB-"), ("[", "-LSB-"),
    ("]", "-RSB-"), ("{", "-LCB-"), ("}", "-RCB-"),
]


def normalize_key(sentence: str) -> str:
    """carb.py:393-415: spaces removed, PTB escapes undone, punct stripped."""
    s = sentence.replace(" ", "")
    for plain, escape in _PTB_ESCAPES:
        s = s.replace(escape, plain)
    return _PUNCT_RE.sub("", s)


def _f1(p, r):
    return 2.0 * p * r / (p + r) if (p + r) > 0 else 0.0


def sentence_contribution(
    gold_exs, pred_exs, confidence_thresholds, matching_func
):
    """One sentence's additive contribution to the PR-sweep arrays
    (carb.py:200-262, 'OPTIMISED GLOBAL MATCH', strategy 'sm').

    ``gold_exs``/``pred_exs``: [(pred, args, confidence)]. Returns the
    four numpy arrays (p, pl, r, rl) indexed by the GLOBAL threshold list
    — pure and additive, so the distributed form sums these per-sentence
    partials (eval/distributed.py)."""
    num_conf = len(confidence_thresholds)
    p = np.zeros(num_conf)
    pl = np.zeros(num_conf)
    r = np.zeros(num_conf)
    rl = np.zeros(num_conf)

    gold_tuples = [MatchTuple(g[0], g[1]) for g in gold_exs]
    pred_tuples = [MatchTuple(e[0], e[1]) for e in pred_exs]
    scores = [
        [matching_func(g, e) for e in pred_tuples] for g in gold_tuples
    ]

    sent_confs = sorted(ex[2] for ex in pred_exs)
    prev_c = 0
    for conf in sent_confs:
        c = confidence_thresholds.index(conf)
        ext_indices = [j for j, ex in enumerate(pred_exs) if ex[2] >= conf]
        recall_numerator = sum(
            max((row[j][1] for j in ext_indices), default=0)
            for row in scores
        )
        # greedy one-to-one precision matching (carb.py:222-247)
        precision_numerator = 0.0
        sel_rows: list = []
        sel_cols: list = []
        for _ in range(min(len(scores), len(ext_indices))):
            best = (-1.0, -1, -1)
            for i in range(len(scores)):
                if i in sel_rows:
                    continue
                for j in ext_indices:
                    if j in sel_cols:
                        continue
                    if scores[i][j][0] > best[0]:
                        best = (scores[i][j][0], i, j)
            if best[1] < 0:
                raise RuntimeError("no match found in precision matching")
            sel_rows.append(best[1])
            sel_cols.append(best[2])
            precision_numerator += best[0]

        p[prev_c : c + 1] += precision_numerator
        pl[prev_c : c + 1] += len(ext_indices)
        r[prev_c : c + 1] += recall_numerator
        rl[prev_c : c + 1] += len(scores)
        prev_c = c + 1
    rl[prev_c:] += len(scores)
    return p, pl, r, rl


def finish_curve(p, pl, r, rl, confidence_thresholds):
    """Summed arrays → (auc, optimal_point, curve) (carb.py:264-314)."""
    prec_scores = [a / b if b > 0 else 1 for a, b in zip(p, pl)]
    rec_scores = [a / b if b > 0 else 0 for a, b in zip(r, rl)]
    f1s = [_f1(a, b) for a, b in zip(prec_scores, rec_scores)]
    if f1s:
        best = int(np.nanargmax(f1s))
        optimal = (
            round(prec_scores[best], 4),
            round(rec_scores[best], 4),
            round(f1s[best], 4),
            confidence_thresholds[best],
        )
        auc_rec = list(rec_scores) + [0.0]
        auc_prec = list(prec_scores) + [1.0]
        auc = round(abs(np.trapz(auc_prec, auc_rec)), 4)
    else:
        optimal = (0, 0, 0, 0)
        auc = 0.0
    return auc, optimal, list(zip(prec_scores, rec_scores, confidence_thresholds))


def compare(
    gold: dict,
    predicted: dict,
    matching_func=binary_linient_tuple_match,
):
    """gold / predicted: {sentence: [(pred, [arg1, arg2, ...], confidence)]}
    (confidence ignored on the gold side).

    Returns (auc, optimal_point, curve) with optimal_point =
    (precision, recall, f1, confidence) at max F1.
    """
    gold = {normalize_key(k): v for k, v in gold.items()}
    predicted = {normalize_key(k): v for k, v in predicted.items()}

    confidence_thresholds = sorted(
        {ex[2] for exs in predicted.values() for ex in exs}
    )
    num_conf = len(confidence_thresholds)
    p = np.zeros(num_conf)
    pl = np.zeros(num_conf)
    r = np.zeros(num_conf)
    rl = np.zeros(num_conf)

    for sent, gold_exs in gold.items():
        pred_exs = predicted.get(sent, [])
        dp, dpl, dr, drl = sentence_contribution(
            gold_exs, pred_exs, confidence_thresholds, matching_func
        )
        p += dp
        pl += dpl
        r += dr
        rl += drl

    return finish_curve(p, pl, r, rl, confidence_thresholds)


def precision_recall(gold: dict, predicted: dict):
    """Zero-threshold P/R for the conformance gate: every prediction kept,
    greedy precision matching + per-gold max recall (the leftmost point of
    the compare() sweep)."""
    gold_n = {normalize_key(k): v for k, v in gold.items()}
    pred_n = {normalize_key(k): v for k, v in predicted.items()}
    p_num = p_den = r_num = r_den = 0.0
    for sent, gold_exs in gold_n.items():
        pred_exs = pred_n.get(sent, [])
        gold_tuples = [MatchTuple(g[0], g[1]) for g in gold_exs]
        pred_tuples = [MatchTuple(e[0], e[1]) for e in pred_exs]
        scores = [
            [binary_linient_tuple_match(g, e) for e in pred_tuples]
            for g in gold_tuples
        ]
        r_num += sum(max((s[1] for s in row), default=0) for row in scores)
        r_den += len(gold_tuples)
        sel_rows: list = []
        sel_cols: list = []
        for _ in range(min(len(gold_tuples), len(pred_tuples))):
            best = (-1.0, -1, -1)
            for i in range(len(scores)):
                if i in sel_rows:
                    continue
                for j in range(len(pred_tuples)):
                    if j in sel_cols:
                        continue
                    if scores[i][j][0] > best[0]:
                        best = (scores[i][j][0], i, j)
            sel_rows.append(best[1])
            sel_cols.append(best[2])
            p_num += best[0]
        p_den += len(pred_tuples)
    # predictions for sentences not in gold still count against precision
    for sent, pred_exs in pred_n.items():
        if sent not in gold_n:
            p_den += len(pred_exs)
    precision = p_num / p_den if p_den else 1.0
    recall = r_num / r_den if r_den else 0.0
    return precision, recall
