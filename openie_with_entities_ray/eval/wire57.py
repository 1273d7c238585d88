"""Wire57 scoring protocol (the reference's alternative benchmark,
/root/reference/carb/wire57_evaluation.py):

- ``tuple_match`` (wire57_evaluation.py:262-288): per-part
  (arg1/rel/arg2) word overlap — NOT multiset: each predicted word
  matching anywhere in the gold part counts, duplicates included; any
  part with zero matches (or predicted-empty vs gold-nonempty) fails the
  whole pair;
- greedy max-F1 one-to-one matching per sentence
  (aggregate_scores_greedily, :169-196);
- micro-averaged precision/recall over sentences (:118-133);
- '.' tokens dropped from subject/object words at parse time
  (process_allennlp_format, :66-77).

Pure kernels + a driver-level ``wire57_scores`` over grouped dicts; the
distributed shape is the same per-sentence co-group as eval/distributed.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple


def _f1(p: float, r: float) -> float:
    return 2 * p * r / (p + r) if (p + r) > 0 else 0.0


def strip_dots(words: List[str]) -> List[str]:
    return [w for w in words if w != "."]


def tuple_match(pred: Tuple[str, str, str], gold: Tuple[str, str, str]):
    """(arg1, rel, arg2) word-overlap match → [precision, recall] or None.

    Predicted arg words have '.' removed (parse-time rule); gold words do
    not. Overlap counts every predicted word found in the gold part
    (duplicates included — the reference does not consume matches)."""
    precision = [0, 0]
    recall = [0, 0]
    for k, (p_text, g_text) in enumerate(zip(pred, gold)):
        predicted_words = p_text.split()
        if k != 1:  # subject/object: '.' dropped at parse time
            predicted_words = strip_dots(predicted_words)
        gold_words = g_text.split()
        if not predicted_words:
            if gold_words:
                return None
            continue
        matching = sum(1 for w in predicted_words if w in gold_words)
        if matching == 0:
            return None
        precision[0] += matching
        precision[1] += len(predicted_words)
        recall[0] += matching
        recall[1] += len(gold_words)
    if recall[1] == 0 or precision[1] == 0:
        return None
    return [precision[0] / precision[1], recall[0] / recall[1]]


def greedy_sentence_scores(gold: List, predicted: List) -> Dict:
    """aggregate_scores_greedily: repeatedly pick the unmatched (gold,
    pred) pair with max F1 until no positive match remains."""
    scores = [[tuple_match(p, g) for p in predicted] for g in gold]
    matches: List[List[int]] = []
    while True:
        max_s = 0.0
        best: Optional[Tuple[int, int]] = None
        for i in range(len(gold)):
            if any(m[0] == i for m in matches):
                continue
            for j in range(len(predicted)):
                if any(m[1] == j for m in matches):
                    continue
                s = scores[i][j]
                if s and _f1(*s) > max_s:
                    max_s = _f1(*s)
                    best = (i, j)
        if best is None:
            break
        matches.append(list(best))
    prec = sum(scores[i][j][0] for i, j in matches)
    rec = sum(scores[i][j][1] for i, j in matches)
    return {
        "precision": [prec, len(predicted)],
        "recall": [rec, len(gold)],
    }


def wire57_scores(gold: Dict, predicted: Dict) -> Dict[str, float]:
    """gold/predicted: {sentence: [(arg1, rel, arg2), ...]} →
    micro-averaged precision/recall/F1 over gold sentences."""
    p_num = p_den = r_num = r_den = 0.0
    for sent, gold_exs in gold.items():
        s = greedy_sentence_scores(gold_exs, predicted.get(sent, []))
        p_num += s["precision"][0]
        p_den += s["precision"][1]
        r_num += s["recall"][0]
        r_den += s["recall"][1]
    precision = p_num / p_den if p_den else 0.0
    recall = r_num / r_den if r_den else 0.0
    return {
        "precision": precision,
        "recall": recall,
        "f1": _f1(precision, recall),
    }
