"""Distributed CaRB-style P/R: the J3 gold⨝predicted co-group as a Ray
groupby + per-sentence kernel + global sum (SURVEY.md A4/J3).

The reference joins per-sentence gold and predicted extraction lists in
driver memory (/root/reference/carb/carb.py:102-119). Here both sides are
Datasets; rows are tagged with their side, unioned, hash-grouped on the
normalized sentence key (carb.py:393-396 semantics), and each group emits
one partial-counter row (zero-threshold point of the PR sweep: greedy
one-to-one precision matching + per-gold max recall). A tiny driver sum
finishes. Scales to arbitrarily many sentences — no corpus-wide dicts.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .benchmark import normalize_key
from .matcher import MatchTuple, binary_linient_tuple_match


def _tag(ds, side: str):
    def add(batch: pa.Table) -> pa.Table:
        keys = [
            normalize_key(s) for s in batch.column("sentence").to_pylist()
        ]
        cols = {
            "sent_key": pa.array(keys, pa.string()),
            "side": pa.array([side] * batch.num_rows, pa.string()),
            "rel": batch.column("rel"),
            "arg1": batch.column("arg1"),
            "arg2": batch.column("arg2"),
        }
        return pa.table(cols)

    return ds.map_batches(add, batch_format="pyarrow")


def _group_counts(group: pd.DataFrame) -> pd.DataFrame:
    gold = group[group["side"] == "g"]
    pred = group[group["side"] == "p"]
    gold_tuples = [
        MatchTuple(r, [a1, a2])
        for r, a1, a2 in zip(gold["rel"], gold["arg1"], gold["arg2"])
    ]
    pred_tuples = [
        MatchTuple(r, [a1, a2])
        for r, a1, a2 in zip(pred["rel"], pred["arg1"], pred["arg2"])
    ]
    scores = [
        [binary_linient_tuple_match(g, e) for e in pred_tuples]
        for g in gold_tuples
    ]
    r_num = sum(max((s[1] for s in row), default=0.0) for row in scores)
    p_num = 0.0
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
    return pd.DataFrame(
        {
            "p_num": [p_num],
            "p_den": [float(len(pred_tuples))],
            "r_num": [r_num],
            "r_den": [float(len(gold_tuples))],
        }
    )


def carb_precision_recall(gold_ds, pred_ds):
    """Both datasets: rows with (sentence, rel, arg1, arg2). Returns
    (precision, recall) at the zero-confidence threshold."""
    unioned = _tag(gold_ds, "g").union(_tag(pred_ds, "p"))
    partials = unioned.groupby("sent_key").map_groups(
        _group_counts, batch_format="pandas"
    )
    pdf = partials.to_pandas().sum()
    precision = pdf["p_num"] / pdf["p_den"] if pdf["p_den"] else 1.0
    recall = pdf["r_num"] / pdf["r_den"] if pdf["r_den"] else 0.0
    return float(precision), float(recall)
