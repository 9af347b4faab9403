"""Label aggregation: observation encoding, specialisation, majority
voting, BILUO decoding.

Numpy re-implementations of the reference's UnifiedAnnotator core
(labelling.py:116-213, 503-531), shared between the Spark operators
and the single-node oracle. All per-token work is vectorized numpy
inside Arrow batches.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from weak_supervision_for_ner_spark.schema import (
    GENERIC_LABELS,
    LABELS,
    LABEL_INDICES,
    MENTIONS_SCHEMA,
    POSITIONED_LABELS,
    SOURCE_INDICES,
    SOURCE_NAMES,
    SOURCE_PRIORS,
)

Span = tuple[int, int]
Vals = tuple[tuple[str, float], ...]
Layers = dict[str, dict[Span, Vals]]

N_STATES = len(POSITIONED_LABELS)
N_SOURCES = len(SOURCE_NAMES)

# Sources excluded as specialisation evidence (labelling.py:183-188):
# the generic proper/nnp/compound detectors cannot specialise others.
_SPECIALISE_EVIDENCE = [
    s for s in SOURCE_NAMES
    if "proper" not in s and "nnp_" not in s and "compound" not in s
]


def layers_from_spans(spans: list) -> Layers:
    """Rebuild the per-source layer dict from the flattened span rows
    produced by ``operators.annotate`` (tuples, lists or dicts)."""
    layers: Layers = {}
    for row in spans:
        if isinstance(row, dict):
            source, start, end, label, conf = (
                row["source"], row["start"], row["end"], row["label"], row["conf"],
            )
        else:
            source, start, end, label, conf = row
        layer = layers.setdefault(source, {})
        key = (int(start), int(end))
        layer[key] = (*layer.get(key, ()), (label, float(conf)))
    return layers


def specialise_layers(layers: Layers) -> Layers:
    """Replace generic ENT/MISC span labels with a precision-weighted
    distribution from overlapping spans of other sources
    (labelling.py:175-213 semantics; 0.3 partial-overlap discount)."""
    from weak_supervision_for_ner_spark.operators.labelling import get_overlaps

    # sort each evidence layer ONCE per doc and pass it through
    # get_overlaps(sorted_items=...): the naive call re-sorted the same
    # layer for EVERY (generic span x evidence source) probe, which
    # made specialisation the single most expensive aggregate step
    # (~0.7 ms/doc, 3x the vote itself); iteration order — and thus
    # float accumulation order — is identical, so output is byte-equal
    sorted_items = {
        s: sorted(layers[s].items()) for s in _SPECIALISE_EVIDENCE if s in layers
    }
    evidence = [s for s in _SPECIALISE_EVIDENCE if s in layers]

    # The evidence sweep depends only on the span COORDS, not on which
    # source/conf is being specialised (the own-source exclusion is a
    # filter, conf multiplies each term) — and the same generic coords
    # recur across ~5 sources per doc. Memoize the ordered
    # (source, label, weight) pair list per coords: the accumulation
    # below replays it in the ORIGINAL iteration order with the same
    # per-term arithmetic, so results are byte-identical while the
    # 13-sources-per-val get_overlaps probing collapses ~5x.
    pair_memo: dict[tuple[int, int], list[tuple[str, str, float]]] = {}

    def evidence_pairs(start: int, end: int) -> list[tuple[str, str, float]]:
        got = pair_memo.get((start, end))
        if got is None:
            got = []
            for other in evidence:
                for s2, e2, vals2 in get_overlaps(
                    start, end, layers, [other], sorted_items=sorted_items
                ):
                    for label2, conf2 in vals2:
                        if label2 in GENERIC_LABELS:
                            continue
                        w = conf2 if (s2 == start and e2 == end) else 0.3 * conf2
                        w *= SOURCE_PRIORS[other].get(label2, (0.5, 0.5))[0]
                        got.append((other, label2, w))
            pair_memo[(start, end)] = got
        return got

    to_add: list[tuple[str, int, int, Vals]] = []
    for source, layer in layers.items():
        if source not in SOURCE_INDICES:
            continue
        for (start, end), vals in layer.items():
            for label, conf in vals:
                if label in GENERIC_LABELS:
                    counts: dict[str, float] = {}
                    for other, label2, w in evidence_pairs(start, end):
                        if other == source:
                            continue
                        counts[label2] = counts.get(label2, 0.0) + conf * w
                    total = sum(counts.values())
                    new_vals = tuple(
                        (l, SOURCE_PRIORS[source].get(l, (0.5, 0.5))[0] * c / total)
                        for l, c in counts.items()
                    )
                    to_add.append((source, start, end, new_vals))
    for source, start, end, vals in to_add:
        layers[source][(start, end)] = vals
    return layers


def extract_sequence(layers: Layers, n_tokens: int) -> np.ndarray:
    """Dense observation tensor (T, n_sources, n_states) float32
    (labelling.py:144-172). Call :func:`specialise_layers` first."""
    X = np.zeros((n_tokens, N_SOURCES, N_STATES), dtype=np.float32)
    X[:, :, 0] = 1.0
    for source, layer in layers.items():
        si = SOURCE_INDICES.get(source)
        if si is None:
            continue
        for (start, end), vals in layer.items():
            for label, conf in vals:
                if label in GENERIC_LABELS or start >= n_tokens:
                    continue
                end = min(end, n_tokens)
                X[start:end, si, 0] = 0.0
                if end - start == 1:
                    X[start, si, LABEL_INDICES[f"U-{label}"]] = conf
                else:
                    X[start, si, LABEL_INDICES[f"B-{label}"]] = conf
                    X[start + 1 : end - 1, si, LABEL_INDICES[f"I-{label}"]] = conf
                    X[end - 1, si, LABEL_INDICES[f"L-{label}"]] = conf
    return X


def sequence_from_spans(spans: list, n_tokens: int) -> np.ndarray:
    return extract_sequence(specialise_layers(layers_from_spans(spans)), n_tokens)


# ---------------------------------------------------------------------------
# Majority voter (labelling.py:503-531)
# ---------------------------------------------------------------------------

# per-label (B, I, L, U) state-index table, precomputed over the closed
# schema label set: the sparse vote previously rebuilt f-string keys per
# token per span — pure overhead on the hot path. A non-schema label
# raising KeyError here is correct: it could never enter the 77-state
# tensor either.
_BILUO_STATES: dict[str, tuple[int, int, int, int]] = {
    lab: tuple(LABEL_INDICES[f"{p}-{lab}"] for p in "BILU") for lab in LABELS
}


def majority_vote_sparse(layers: Layers, n_tokens: int, nb_sources_threshold: int = 4):
    """Sparse majority vote, identical semantics to
    ``majority_vote(extract_sequence(layers))`` but computed from the
    span lists directly — avoids materializing the dense
    (T, sources, states) tensor whose memory traffic dominates and
    caps multi-core scaling. Call on specialised layers.

    Replicates the dense tensor EXACTLY, including its write semantics:
    when several spans of one source write the same (token, state) cell
    the LAST write wins (dict iteration order — the dense assignment
    overwrites), and the per-(token, source) argmax then runs over cell
    VALUES with np.argmax's first-max tie-break (smallest state index;
    cells <= 0 lose to the zeroed O cell). Tokens covered by no
    non-generic span vote O."""
    # cells[(t * N_SOURCES + si) * N_STATES + state] = conf, LAST write
    # wins — the dense X[t, si, state] = conf assignment
    cells: dict[int, float] = {}
    biluo = _BILUO_STATES
    for source, layer in layers.items():
        si = SOURCE_INDICES.get(source)
        if si is None:
            continue
        for (start, end), vals in layer.items():
            if start >= n_tokens:
                continue
            end = min(end, n_tokens)
            for label, conf in vals:
                if label in GENERIC_LABELS:
                    continue
                b_st, i_st, l_st, u_st = biluo[label]
                base = start * N_SOURCES + si
                if end - start == 1:
                    cells[base * N_STATES + u_st] = conf
                    continue
                for t in range(start, end):
                    state = b_st if t == start else (l_st if t == end - 1 else i_st)
                    cells[(t * N_SOURCES + si) * N_STATES + state] = conf

    # best[(t, s)] = (conf, -state) maximum => argmax with min-index
    # tie-break over the surviving cell values
    best: dict[int, tuple[float, int]] = {}
    for key, conf in cells.items():
        if conf <= 0:
            continue  # loses the dense argmax to the 0.0 O cell
        tsi, state = divmod(key, N_STATES)
        cur = best.get(tsi)
        if cur is None or (conf, -state) > cur:
            best[tsi] = (conf, -state)

    counts = np.zeros((n_tokens, N_STATES))
    counts[:, 0] = N_SOURCES
    for key, (_conf, neg_state) in best.items():
        t = key // N_SOURCES
        counts[t, -neg_state] += 1.0
        counts[t, 0] -= 1.0
    non_o = counts[:, 1:]
    fired = non_o.sum(axis=1)
    states = np.where(fired >= nb_sources_threshold, non_o.argmax(axis=1) + 1, 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        conf_label = non_o.max(axis=1) / np.where(fired > 0, fired, 1.0)
    conf_o = counts[:, 0] / N_SOURCES
    confidences = np.where(states > 0, conf_label, conf_o)
    return states, confidences


def majority_vote(X: np.ndarray, nb_sources_threshold: int = 4):
    """Per-token majority over the sources' argmax labels; emit a label
    when >= threshold sources fire. Returns (state_indices, confidences)."""
    T = len(X)
    if T == 0:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    am = X.argmax(axis=2)  # (T, S)
    counts = np.zeros((T, N_STATES))
    np.add.at(counts, (np.repeat(np.arange(T), N_SOURCES), am.ravel()), 1.0)
    non_o = counts[:, 1:]
    fired = non_o.sum(axis=1)
    states = np.where(fired >= nb_sources_threshold, non_o.argmax(axis=1) + 1, 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        conf_label = non_o.max(axis=1) / np.where(fired > 0, fired, 1.0)
    conf_o = counts[:, 0] / counts.sum(axis=1)
    confidences = np.where(states > 0, conf_label, conf_o)
    return states, confidences


# ---------------------------------------------------------------------------
# BILUO decoding: per-token state path -> spans (labelling.py:116-141)
# ---------------------------------------------------------------------------

def decode_biluo(states: np.ndarray, confidences: np.ndarray) -> dict[Span, tuple[str, float]]:
    spans: dict[Span, tuple[str, float]] = {}
    labels = [POSITIONED_LABELS[int(s)] for s in states]
    T = len(labels)
    i = 0
    while i < T:
        p = labels[i]
        if p == "O":
            i += 1
        elif p[0] in "UIL":
            spans[(i, i + 1)] = (p[2:], round(float(confidences[i]), 3))
            i += 1
        else:  # B-
            start, label = i, p[2:]
            i += 1
            while i < T - 1 and labels[i] != "O" and labels[i][0] == "I":
                i += 1
            if i < T and labels[i][0] == "L":
                spans[(start, i + 1)] = (
                    label, round(float(confidences[start : i + 1].max()), 3),
                )
            i += 1
    return spans


# ---------------------------------------------------------------------------
# Spark wrapper: majority-voter mentions from the annotated table
# ---------------------------------------------------------------------------

def majority_voter_mentions(
    annotated: DataFrame, nb_sources_threshold: int = 4,
    source_name: str = "majority_voter",
    sources_to_keep: list[str] | None = None,
) -> DataFrame:
    """Stateless narrow mapInPandas: annotated rows -> aggregated
    mention rows (the relational form of MajorityVoter.annotate).

    ``sources_to_keep`` restricts the vote to a source subset AFTER
    specialisation, matching the reference's UnifiedAnnotator order
    (specialise over all layers, then extract only kept sources,
    labelling.py:144-175)."""
    keep = None if sources_to_keep is None else set(sources_to_keep)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, tokens, spans in zip(pdf["url"], pdf["tokens"], pdf["spans"]):
                layers = specialise_layers(layers_from_spans(list(spans)))
                if keep is not None:
                    layers = {s: l for s, l in layers.items() if s in keep}
                states, confs = majority_vote_sparse(
                    layers, len(tokens), nb_sources_threshold
                )
                for (start, end), (label, conf) in decode_biluo(states, confs).items():
                    rows.append(
                        (url, source_name, start, end, label, conf,
                         " ".join(tokens[start:end]))
                    )
            yield pd.DataFrame(
                rows,
                columns=["url", "source", "start", "end", "label", "conf", "text"],
            )

    return annotated.mapInPandas(run, schema=MENTIONS_SCHEMA)
