"""token_logloss vs a numpy oracle that replicates the reference's
compute_logloss (analysis.py:165-210): per-doc BILUO one-hot gold
matrix, predicted-conf matrix with the doc-label-space filter and the
O = 1 - sum column, then legacy sklearn log_loss semantics
(clip to [eps, 1-eps], row-renormalise, -sum(y*log(p)))."""

import math

import numpy as np
import pytest


EPS = 1e-15

# (url, start, end, label[, conf]) span fixtures: multi-token spans,
# an out-of-label-space pred ('X'), a same-cell duplicate (max wins),
# an overlapping extra pred on doc d1, and a doc (d3) with no preds.
GOLD = [
    ("d1", 2, 5, "PER"),
    ("d1", 7, 8, "ORG"),
    ("d2", 0, 2, "ORG"),
    ("d3", 1, 3, "LOC"),
]
DOC_LEN = {"d1": 10, "d2": 4, "d3": 5}
PRED = [
    ("d1", 2, 5, "PER", 0.9),
    ("d1", 2, 5, "PER", 0.6),   # duplicate cell: max conf wins
    ("d1", 7, 8, "PER", 0.4),   # wrong label, in doc space
    ("d1", 4, 6, "ORG", 0.3),   # overlaps the PER span
    ("d1", 0, 3, "X", 0.8),     # outside doc gold label space: skipped
    ("d2", 0, 2, "ORG", 0.7),
    ("d2", 3, 4, "ORG", 0.2),
]


def oracle_logloss():
    total, n_tokens = 0.0, 0
    for url, n in sorted(DOC_LEN.items()):
        labels = sorted({g[3] for g in GOLD if g[0] == url})
        pos = ["O"] + [f"{b}-{lab}" for lab in labels for b in "BILU"]
        idx = {p: i for i, p in enumerate(pos)}
        gold = np.zeros((n, len(pos)))
        for u, s, e, lab in GOLD:
            if u != url:
                continue
            if e == s + 1:
                gold[s, idx[f"U-{lab}"]] = 1
            else:
                gold[s, idx[f"B-{lab}"]] = 1
                for i in range(s + 1, e - 1):
                    gold[i, idx[f"I-{lab}"]] = 1
                gold[e - 1, idx[f"L-{lab}"]] = 1
        gold[:, 0] = 1 - gold[:, 1:].sum(axis=1)
        pred = np.zeros_like(gold)
        for u, s, e, lab, conf in PRED:
            if u != url or lab not in labels:
                continue
            if e == s + 1:
                cells = [(s, f"U-{lab}")]
            else:
                cells = [(s, f"B-{lab}")] + [
                    (i, f"I-{lab}") for i in range(s + 1, e - 1)
                ] + [(e - 1, f"L-{lab}")]
            for i, q in cells:
                pred[i, idx[q]] = max(pred[i, idx[q]], conf)
        pred[:, 0] = 1 - pred[:, 1:].sum(axis=1)
        # legacy sklearn.metrics.log_loss(normalize=False)
        clipped = np.clip(pred, EPS, 1 - EPS)
        clipped /= clipped.sum(axis=1, keepdims=True)
        total += -(gold * np.log(clipped)).sum()
        n_tokens += n
    return total, n_tokens


@pytest.fixture(scope="module")
def frames(spark):
    gold = spark.createDataFrame(GOLD, "url string, start int, end int, label string")
    pred = spark.createDataFrame(
        PRED, "url string, start int, end int, label string, conf double"
    )
    doc_len = spark.createDataFrame(
        sorted(DOC_LEN.items()), "url string, n_tokens int"
    )
    return gold, pred, doc_len


def test_token_logloss_matches_reference_oracle(frames):
    from weak_supervision_for_ner_spark.operators.evaluate import token_logloss

    gold, pred, doc_len = frames
    row = token_logloss(gold, pred, doc_len).collect()[0]
    exp_total, exp_n = oracle_logloss()
    assert row["n_tokens"] == exp_n
    assert math.isclose(row["logloss_total"], exp_total, rel_tol=1e-9)
    assert math.isclose(row["logloss_per_token"], exp_total / exp_n, rel_tol=1e-9)


def test_token_logloss_doc_len_defaults_to_gold_extent(frames):
    from weak_supervision_for_ner_spark.operators.evaluate import token_logloss

    gold, pred, _ = frames
    row = token_logloss(gold, pred).collect()[0]
    # max(end) per url: d1=8, d2=2, d3=3
    assert row["n_tokens"] == 8 + 2 + 3
    assert row["logloss_total"] > 0


def test_token_logloss_ignores_degenerate_spans(spark, frames):
    """end <= start would make F.sequence descend (wrong token indices
    injected silently); such spans must contribute nothing instead."""
    from weak_supervision_for_ner_spark.operators.evaluate import token_logloss

    gold, pred, doc_len = frames
    degenerate = spark.createDataFrame(
        [("d1", 5, 5, "ORG", 0.9), ("d1", 6, 4, "ORG", 0.9)],
        "url string, start int, end int, label string, conf double",
    )
    base = token_logloss(gold, pred, doc_len).collect()[0]
    with_deg = token_logloss(gold, pred.unionByName(degenerate), doc_len).collect()[0]
    assert with_deg["n_tokens"] == base["n_tokens"]
    assert math.isclose(with_deg["logloss_total"], base["logloss_total"], rel_tol=1e-12)
