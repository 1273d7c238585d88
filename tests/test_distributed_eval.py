"""Distributed CaRB sweep must equal the driver-side compare()."""

import pyarrow as pa
import pytest


GOLD = {
    "Alice founded Acme .": [("founded", ["Alice", "Acme"], 1.0)],
    "Bob bought Hooli .": [
        ("bought", ["Bob", "Hooli"], 1.0),
        ("acquired", ["Bob", "Hooli"], 1.0),
    ],
    "Carol slept .": [("slept", ["Carol", ""], 1.0)],
}
PRED = {
    "Alice founded Acme .": [("founded", ["Alice", "Acme"], 0.9)],
    "Bob bought Hooli .": [
        ("bought", ["Bob", "Hooli"], 0.8),
        ("sold", ["Bob", "nothing"], 0.4),
    ],
    "Extra sentence .": [("extra", ["X", "Y"], 0.5)],
}


def _to_ds(d, with_conf):
    import ray.data

    rows = {"sentence": [], "rel": [], "arg1": [], "arg2": []}
    if with_conf:
        rows["confidence"] = []
    for sent, exs in d.items():
        for rel, args, conf in exs:
            rows["sentence"].append(sent)
            rows["rel"].append(rel)
            rows["arg1"].append(args[0])
            rows["arg2"].append(args[1] if len(args) > 1 else "")
            if with_conf:
                rows["confidence"].append(conf)
    return ray.data.from_arrow(pa.table(rows))


def test_carb_sweep_matches_driver_compare(ray_session):
    from openie_with_entities_ray.eval.benchmark import compare
    from openie_with_entities_ray.eval.distributed import carb_sweep

    want_auc, want_opt, want_curve = compare(GOLD, PRED)
    got_auc, got_opt, got_curve = carb_sweep(
        _to_ds(GOLD, False), _to_ds(PRED, True)
    )
    assert got_auc == want_auc
    assert got_opt == want_opt
    assert [
        (round(p, 10), round(r, 10), c) for p, r, c in got_curve
    ] == [(round(p, 10), round(r, 10), c) for p, r, c in want_curve]


def test_carb_precision_ignores_pred_only_sentences(ray_session):
    """Reference semantics (carb/carb.py iterates GOLD sentences only):
    predictions on sentences absent from gold enter neither
    denominator, matching carb_sweep's zero-threshold point."""
    import ray.data

    from openie_with_entities_ray.eval.distributed import (
        carb_precision_recall,
    )

    gold = ray.data.from_items(
        [{"sentence": "S1 .", "rel": "r", "arg1": "a", "arg2": "b"}]
    )
    pred = ray.data.from_items(
        [
            {"sentence": "S1 .", "rel": "r", "arg1": "a", "arg2": "b"},
            {"sentence": "S2 .", "rel": "x", "arg1": "p", "arg2": "q"},
            {"sentence": "S2 .", "rel": "y", "arg1": "p", "arg2": "q"},
        ]
    )
    precision, recall = carb_precision_recall(gold, pred)
    assert precision == 1.0 and recall == 1.0
