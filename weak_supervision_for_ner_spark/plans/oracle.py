"""Single-node pure-numpy oracle (SURVEY.md §5.2).

Implements the identical semantics as the Spark pipeline by calling
the SAME per-document core (operators.labelling / aggregate / hmm /
triples doc functions) in a plain Python loop — no Spark. Golden
parity tests assert the distributed output equals this oracle exactly
(spans, mentions) and at P/R >= 0.95 (triples, per north_rule).
"""

from __future__ import annotations

import numpy as np

from weak_supervision_for_ner_spark.operators.aggregate import (
    decode_biluo,
    majority_vote,
    sequence_from_spans,
)
from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator
from weak_supervision_for_ner_spark.operators.labelling import (
    Doc,
    annotate_document,
    flatten_spans,
)
from weak_supervision_for_ner_spark.operators.triples import extract_triples_from_doc
from weak_supervision_for_ner_spark.sources.gazetteer import FIRST_NAMES, build_gazetteers
from weak_supervision_for_ner_spark.operators.aggregate import N_SOURCES, N_STATES


def oracle_annotate(pages: list[dict], form_freqs: dict | None = None) -> list[dict]:
    """[{url, text}, ...] -> [{url, tokens, spans}, ...]"""
    gazetteers = build_gazetteers()
    out = []
    for page in pages:
        if page.get("lang", "en") != "en":
            continue
        doc = annotate_document(
            Doc(page["text"] or "", form_freqs=form_freqs), gazetteers, FIRST_NAMES
        )
        out.append({"url": page["url"], "tokens": doc.tokens, "spans": flatten_spans(doc)})
    return out


def oracle_majority_mentions(annotated: list[dict], threshold: int = 4) -> list[tuple]:
    rows = []
    for doc in annotated:
        X = sequence_from_spans(doc["spans"], len(doc["tokens"]))
        states, confs = majority_vote(X, threshold)
        for (s, e), (lab, conf) in decode_biluo(states, confs).items():
            rows.append((doc["url"], "majority_voter", s, e, lab, conf,
                         " ".join(doc["tokens"][s:e])))
    return rows


def oracle_hmm_fit(annotated: list[dict], n_iter: int = 10, seed: int = 42) -> HMMAggregator:
    """Single-node Baum-Welch with the same init/E/M code paths."""
    model = HMMAggregator(n_iter=n_iter, seed=seed)
    best = model._best_coverage_source_index()

    init = np.zeros(N_STATES)
    trans = np.zeros((N_STATES, N_STATES))
    obs = np.zeros((N_SOURCES, N_STATES))
    seqs = []
    for doc in annotated:
        if not doc["tokens"]:
            continue
        X = sequence_from_spans(doc["spans"], len(doc["tokens"]))
        seqs.append(X)
        bestpath = X[:, best, :].argmax(axis=1)
        init[bestpath[0]] += 1
        np.add.at(trans, (bestpath[:-1], bestpath[1:]), 1.0)
        obs += X.sum(axis=0)
    model.initialise(init, trans, obs)

    prev = None
    for _ in range(n_iter):
        logprob = 0.0
        start = np.zeros(N_STATES)
        tr = np.zeros((N_STATES, N_STATES))
        ob = np.zeros((N_SOURCES, N_STATES, N_STATES))
        for X in seqs:
            lp, st, t2, o2 = model.e_step(X)
            logprob += lp
            start += st
            tr += t2
            ob += o2
        model.m_step(start, tr, ob)
        model.history.append(float(logprob))
        if prev is not None and abs(logprob - prev) < model.tol * max(len(seqs), 1):
            break
        prev = logprob
    return model


def oracle_hmm_mentions(model: HMMAggregator, annotated: list[dict]) -> list[tuple]:
    rows = []
    for doc in annotated:
        if not doc["tokens"]:
            continue
        X = sequence_from_spans(doc["spans"], len(doc["tokens"]))
        path, confs = model.label(X)
        for (s, e), (lab, conf) in decode_biluo(path, confs).items():
            rows.append((doc["url"], model.source_name, s, e, lab, conf,
                         " ".join(doc["tokens"][s:e])))
    return rows


def oracle_triples(annotated: list[dict], mentions: list[tuple]) -> list[tuple]:
    by_url: dict[str, list] = {}
    for (url, _src, s, e, lab, conf, _txt) in mentions:
        by_url.setdefault(url, []).append((s, e, lab, conf))
    rows = []
    for doc in annotated:
        ms = by_url.get(doc["url"], [])
        rows.extend(extract_triples_from_doc(doc["url"], doc["tokens"], ms))
    return rows
