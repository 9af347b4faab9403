"""Hidden-Markov-model label aggregator (Baum-Welch EM + Viterbi).

From-scratch numpy re-implementation of the reference's HMMAnnotator
(labelling.py:235-495). The reference inherits forward/backward/
Viterbi from hmmlearn's C code; here they are explicit log-space
numpy (≈60 LoC) as required by the north_star.

Distributed execution (SURVEY.md §3.2):

- priors initialisation = ONE fused mapInPandas pass producing
  per-partition (init, trans, obs) count matrices (the reference makes
  three tee'd generator passes, labelling.py:248-252) + driver sum;
- each EM iteration = mapInPandas E-step emitting ONE partial-stats
  row per partition (map-side combine) + driver-side final sum and
  M-step; params re-broadcast per iteration;
- per-iteration checkpoints (params + logprob) make the loop resumable
  mid-pipeline (north_rule), and Spark accumulator-style counters
  (docs, tokens) ride along in the stats rows as lineage metrics.

Determinism: dirichlet inits are seeded (the reference's are not,
labelling.py:332/357 — SURVEY.md §7.4 calls this out as required).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from weak_supervision_for_ner_spark.operators.aggregate import (
    N_SOURCES,
    N_STATES,
    decode_biluo,
    sequence_from_spans,
)
from weak_supervision_for_ner_spark.schema import (
    MENTIONS_SCHEMA,
    OUT_PRECISION,
    OUT_RECALL,
    POSITIONED_LABELS,
    SOURCE_NAMES,
    SOURCE_PRIORS,
)

_NINF = -np.inf


# ---------------------------------------------------------------------------
# Log-space DP kernels
# ---------------------------------------------------------------------------

def _logsumexp(a: np.ndarray, axis: int = -1) -> np.ndarray:
    amax = np.max(a, axis=axis, keepdims=True)
    amax_safe = np.where(np.isfinite(amax), amax, 0.0)
    with np.errstate(divide="ignore"):
        out = np.log(np.sum(np.exp(a - amax_safe), axis=axis)) + np.squeeze(amax_safe, axis)
    return np.where(np.isfinite(np.squeeze(amax, axis)), out, _NINF)


def forward_pass(log_start, log_trans, framelogprob):
    T_len = len(framelogprob)
    fwd = np.empty((T_len, N_STATES))
    fwd[0] = log_start + framelogprob[0]
    for t in range(1, T_len):
        fwd[t] = _logsumexp(fwd[t - 1][:, None] + log_trans, axis=0) + framelogprob[t]
    return _logsumexp(fwd[-1], axis=0), fwd


def backward_pass(log_trans, framelogprob):
    T_len = len(framelogprob)
    bwd = np.zeros((T_len, N_STATES))
    for t in range(T_len - 2, -1, -1):
        bwd[t] = _logsumexp(log_trans + (framelogprob[t + 1] + bwd[t + 1])[None, :], axis=1)
    return bwd


def viterbi_pass(log_start, log_trans, framelogprob):
    T_len = len(framelogprob)
    delta = log_start + framelogprob[0]
    backptr = np.empty((T_len, N_STATES), dtype=np.int32)
    # preallocated score buffer + index row: identical arithmetic, no
    # per-step (K, K) allocation (r7)
    scores = np.empty_like(log_trans)
    idx = np.arange(N_STATES)
    for t in range(1, T_len):
        np.add(delta[:, None], log_trans, out=scores)
        backptr[t] = scores.argmax(axis=0)
        delta = scores[backptr[t], idx] + framelogprob[t]
    path = np.empty(T_len, dtype=np.int32)
    path[-1] = int(delta.argmax())
    for t in range(T_len - 2, -1, -1):
        path[t] = backptr[t + 1, path[t + 1]]
    return float(delta.max()), path


# ---------------------------------------------------------------------------
# The aggregator
# ---------------------------------------------------------------------------

class HMMAggregator:
    """77-state HMM over multi-source BILUO observations."""

    def __init__(self, source_name: str = "HMM", n_iter: int = 10,
                 tol: float = 1e-2, seed: int = 42, informative_priors: bool = True,
                 sources_to_keep: list[str] | None = None):
        self.source_name = source_name
        self.n_iter = n_iter
        self.tol = tol
        self.seed = seed
        self.informative_priors = informative_priors
        # sources_to_keep (UnifiedAnnotator, labelling.py:93-100): train
        # and decode on a source subset. Excluded sources are pinned to
        # deterministic O-emitters and their observation columns masked
        # to the default O, so they contribute a constant 0 to every
        # frame log-likelihood — exactly as if absent from the model.
        self._excluded: np.ndarray | None = None
        if sources_to_keep is not None:
            keep = set(sources_to_keep)
            unknown = keep - set(SOURCE_NAMES)
            if unknown:
                raise ValueError(f"unknown sources: {sorted(unknown)}")
            self._excluded = np.array(
                [i for i, s in enumerate(SOURCE_NAMES) if s not in keep], dtype=int
            )
        self.startprob_prior = None
        self.startprob_ = None
        self.transmat_prior = None
        self.transmat_ = None
        self.emission_priors = None
        self.emission_probs = None
        self.history: list[float] = []

    # -- priors --------------------------------------------------------

    def _best_coverage_source_index(self) -> int:
        excluded = set() if self._excluded is None else set(self._excluded.tolist())
        candidates = [s for i, s in enumerate(SOURCE_NAMES) if i not in excluded]
        source = sorted(candidates, key=lambda s: len(SOURCE_PRIORS[s]))[-1]
        return SOURCE_NAMES.index(source)

    def _apply_source_mask(self, X: np.ndarray) -> np.ndarray:
        """Reset excluded sources' observation columns to the default O."""
        if self._excluded is None or not len(self._excluded):
            return X
        X = X.copy()
        X[:, self._excluded, :] = 0.0
        X[:, self._excluded, 0] = 1.0
        return X

    def _pin_excluded_emissions(self) -> None:
        """Excluded sources emit O with probability 1 in every state (a
        constant likelihood factor of 0 in log space); priors are pinned
        too, so the M-step keeps them there."""
        if self._excluded is None or not len(self._excluded):
            return
        onehot = np.zeros((N_STATES, N_STATES))
        onehot[:, 0] = 1.0
        self.emission_probs[self._excluded] = onehot
        self.emission_priors[self._excluded] = onehot

    def initialise(self, init_counts, trans_counts, obs_counts) -> None:
        """Build priors from corpus count aggregations
        (labelling.py:314-423 semantics, seeded RNG)."""
        rng = np.random.default_rng(self.seed)
        init_counts = init_counts.astype(np.float64).copy()
        trans_counts = trans_counts.astype(np.float64).copy()
        obs_counts = obs_counts.astype(np.float64).copy()

        for i, label in enumerate(POSITIONED_LABELS):
            if i == 0 or label[0] in "BU":
                init_counts[i] += 1
        self.startprob_prior = init_counts + 1
        self.startprob_ = rng.dirichlet(init_counts + 1e-10)

        for i, label in enumerate(POSITIONED_LABELS):
            if label[0] in "BI":
                trans_counts[i, POSITIONED_LABELS.index("I-" + label[2:])] += 1
                trans_counts[i, POSITIONED_LABELS.index("L-" + label[2:])] += 1
            elif i == 0 or label[0] in "UL":
                for j, label2 in enumerate(POSITIONED_LABELS):
                    if j == 0 or label2[0] in "BU":
                        trans_counts[i, j] += 1
        self.transmat_prior = trans_counts + 1
        self.transmat_ = np.vstack(
            [rng.dirichlet(row + 1e-10) for row in trans_counts]
        )

        self._initialise_emissions(obs_counts)
        self._pin_excluded_emissions()

    def _initialise_emissions(self, obs_counts: np.ndarray, strength: float = 1000.0):
        """Emission priors from SOURCE_PRIORS P/R with boundary-error x5
        and same-position x2 boosts (labelling.py:361-423)."""
        for si, source in enumerate(SOURCE_NAMES):
            obs_counts[si, 0] += 1
            for pi, pos_label in enumerate(POSITIONED_LABELS[1:], start=1):
                if pos_label[2:] in SOURCE_PRIORS[source]:
                    obs_counts[si, pi] += 1
        obs_probs = obs_counts / obs_counts.sum(axis=1, keepdims=True)

        prior_prec = np.full((N_SOURCES, N_STATES), 1.0)
        prior_rec = np.zeros((N_SOURCES, N_STATES))
        for si, source in enumerate(SOURCE_NAMES):
            for pi, pos_label in enumerate(POSITIONED_LABELS):
                if pi == 0 or not self.informative_priors:
                    prior_rec[si, pi] = OUT_RECALL
                    prior_prec[si, pi] = OUT_PRECISION
                elif pos_label[2:] in SOURCE_PRIORS[source]:
                    p, r = SOURCE_PRIORS[source][pos_label[2:]]
                    prior_prec[si, pi] = p
                    prior_rec[si, pi] = r
                # else: recall 0, precision 1.0 (reference defaults)

        labels_arr = np.array([l[2:] if l != "O" else "" for l in POSITIONED_LABELS])
        bilu_arr = np.array([l[0] for l in POSITIONED_LABELS])
        same_label = (labels_arr[:, None] == labels_arr[None, :]) & (labels_arr[:, None] != "")
        same_pos = (bilu_arr[:, None] == bilu_arr[None, :])
        nontrivial = np.ones((N_STATES, N_STATES), bool)
        nontrivial[0, :] = False
        nontrivial[:, 0] = False

        matrix = np.zeros((N_SOURCES, N_STATES, N_STATES))
        eye = np.eye(N_STATES, dtype=bool)
        for si in range(N_SOURCES):
            recall = prior_rec[si]  # (S,)
            matrix[si][eye] = recall
            error = (
                (1 - recall[:, None])
                * (1 - prior_prec[si][None, :])
                * (0.001 + obs_probs[si][None, :])
            )
            if self.informative_priors:
                error = np.where(same_label & nontrivial, error * 5, error)
                error = np.where(same_pos & nontrivial, error * 2, error)
            error[eye] = 0.0
            err_sum = error.sum(axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                scale = np.where(err_sum > 0, (1 - recall) / err_sum, 0.0)
            matrix[si] += error * scale[:, None]

        self.emission_priors = matrix * strength
        self.emission_probs = matrix

    # -- likelihood / EM -------------------------------------------------

    def _emission_log_cache(self):
        """(log B[:, :, 0], its source-sum) — recomputed only when the
        emission tensor object changes (per EM iteration / per task),
        not per document: np.log of the 37x77 slice plus two errstate
        context switches per doc were ~15% of framelogprob (r7)."""
        ep = self.emission_probs
        cache = getattr(self, "_logB0_cache", None)
        if cache is None or cache[0] is not ep:
            with np.errstate(divide="ignore"):
                logB0 = np.log(ep[:, :, 0])  # (S, K)
            cache = (ep, logB0, logB0.sum(axis=0))
            self._logB0_cache = cache
        return cache[1], cache[2]

    def _log_start_trans(self):
        """Cached (log startprob, log transmat) for Viterbi decode —
        the decode pass is stateless, so these are per-task constants
        that were being re-logged per document (6k np.log calls/doc)."""
        sp, tm = self.startprob_, self.transmat_
        cache = getattr(self, "_lst_cache", None)
        if cache is None or cache[0] is not sp or cache[1] is not tm:
            with np.errstate(divide="ignore"):
                cache = (sp, tm, np.log(sp), np.log(tm))
            self._lst_cache = cache
        return cache[2], cache[3]

    def framelogprob(self, X: np.ndarray) -> np.ndarray:
        """log Σ_sources X·emissionᵀ with masked -inf and the
        zero-observation constraint (labelling.py:434-448).

        Sparse fast path: most (token, source) cells hold the default
        O observation, whose contribution is the constant column
        log B[s][:, 0]; only cells actually covered by a span (col 0
        zeroed, extract_sequence) pay a matvec + correction."""
        T_len = len(X)
        logB0, logB0_sum = self._emission_log_cache()
        frame = np.tile(logB0_sum, (T_len, 1))
        active = X[:, :, 0] == 0  # (T, S): span-covered cells
        for s in np.nonzero(active.any(axis=0))[0]:
            rows = np.nonzero(active[:, s])[0]
            probs = X[rows, s, :].astype(np.float64) @ self.emission_probs[s].T
            # no errstate needed: the argument is clamped >= 1e-300, so
            # np.log cannot warn; values are identical to the previous
            # context-managed form
            lp = np.where(probs > 0, np.log(np.maximum(probs, 1e-300)), _NINF)
            frame[rows] += lp - logB0[s]
        observed = X.sum(axis=1).astype(bool)
        return np.where(observed, frame, _NINF)

    def e_step(self, X: np.ndarray):
        """One document's sufficient statistics.

        Scaled (linear-space) forward-backward: per step it is pure
        matmuls, and the xi transition-count sum factorizes into ONE
        (K,T)x(T,K) matmul — 10-20x faster than per-step log-space
        logsumexp loops. Falls back to the log-space path on numeric
        degeneracy (a step whose scale underflows)."""
        X = self._apply_source_mask(X)
        frame = self.framelogprob(X)
        out = self._scaled_forward_backward(frame)
        if out is None:
            out = self._logspace_forward_backward(frame)
        logprob, posteriors, trans = out
        start = posteriors[0]
        # obs[s, k, j] += X[t, s, j] * posteriors[t, k]  (labelling.py:473-480)
        obs = (
            X.reshape(len(X), -1).astype(np.float64).T @ posteriors
        ).reshape(N_SOURCES, N_STATES, N_STATES).transpose(0, 2, 1)
        return logprob, start, trans, obs

    def _scaled_forward_backward(self, frame: np.ndarray):
        T_len = len(frame)
        m = frame.max(axis=1)
        if not np.all(np.isfinite(m)):
            return None
        B = np.exp(frame - m[:, None])  # (T, K), rows in (0, 1]
        A = self.transmat_
        alpha = np.empty((T_len, N_STATES))
        scale = np.empty(T_len)
        a = self.startprob_ * B[0]
        scale[0] = a.sum()
        if scale[0] <= 0:
            return None
        alpha[0] = a / scale[0]
        for t in range(1, T_len):
            a = (alpha[t - 1] @ A) * B[t]
            scale[t] = a.sum()
            if scale[t] <= 0:
                return None
            alpha[t] = a / scale[t]
        beta = np.empty((T_len, N_STATES))
        beta[-1] = 1.0
        # W[t] = B[t] * beta[t] / scale[t] for t >= 1 (the backward message)
        for t in range(T_len - 2, -1, -1):
            beta[t] = A @ (B[t + 1] * beta[t + 1]) / scale[t + 1]
        gamma = alpha * beta
        gamma /= np.maximum(gamma.sum(axis=1, keepdims=True), 1e-300)
        if T_len > 1:
            W = (B[1:] * beta[1:]) / scale[1:, None]
            trans = A * (alpha[:-1].T @ W)
        else:
            trans = np.zeros((N_STATES, N_STATES))
        logprob = float(np.log(scale).sum() + m.sum())
        return logprob, gamma, trans

    def _logspace_forward_backward(self, frame: np.ndarray):
        with np.errstate(divide="ignore"):
            log_start = np.log(self.startprob_)
            log_trans = np.log(self.transmat_)
        logprob, fwd = forward_pass(log_start, log_trans, frame)
        bwd = backward_pass(log_trans, frame)
        log_gamma = fwd + bwd
        log_gamma -= _logsumexp(log_gamma, axis=1)[:, None]
        posteriors = np.exp(log_gamma)
        if len(frame) > 1:
            with np.errstate(invalid="ignore"):
                xi = np.exp(
                    fwd[:-1, :, None]
                    + log_trans[None, :, :]
                    + (frame[1:] + bwd[1:])[:, None, :]
                    - logprob
                )
            xi = np.nan_to_num(xi, nan=0.0, posinf=0.0)
            trans = xi.sum(axis=0)
        else:
            trans = np.zeros((N_STATES, N_STATES))
        return logprob, posteriors, trans

    def m_step(self, start, trans, obs) -> None:
        """Dirichlet-MAP re-estimation masked to initial support
        (labelling.py:462-468 + hmmlearn _do_mstep semantics)."""
        sp = np.maximum(self.startprob_prior - 1 + start, 0)
        self.startprob_ = np.where(self.startprob_ == 0, 0, sp)
        self.startprob_ /= self.startprob_.sum()
        tm = np.maximum(self.transmat_prior - 1 + trans, 0)
        tm = np.where(self.transmat_ == 0, 0, tm)
        self.transmat_ = tm / np.maximum(tm.sum(axis=1, keepdims=True), 1e-100)
        counts = self.emission_priors + obs
        probs = counts / (counts + 1e-100).sum(axis=2, keepdims=True)
        self.emission_probs = np.where(self.emission_probs > 0, probs, 0)

    def label(self, X: np.ndarray):
        """Viterbi decode one doc -> (state path, per-token confidence)
        (labelling.py:291-311)."""
        X = self._apply_source_mask(X)
        frame = self.framelogprob(X)
        log_start, log_trans = self._log_start_trans()
        _, path = viterbi_pass(log_start, log_trans, frame)
        # only the chosen path's cells need exponentiating: exp applied
        # to the same (frame - logsumexp) values the full (T, K) proba
        # matrix held, so the confidences are bit-identical
        lse = _logsumexp(frame, axis=1)
        confidences = np.exp(frame[np.arange(len(X)), path] - lse)
        return path, confidences

    # -- persistence ------------------------------------------------------

    def save(self, path: str, iteration: int | None = None, logprob: float | None = None):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(
            path,
            startprob_prior=self.startprob_prior, startprob=self.startprob_,
            transmat_prior=self.transmat_prior, transmat=self.transmat_,
            emission_priors=self.emission_priors, emission_probs=self.emission_probs,
        )
        meta = {"iteration": iteration, "logprob": logprob, "history": self.history,
                "n_states": N_STATES, "n_sources": N_SOURCES}
        with open(path + ".meta.json", "w") as fd:
            json.dump(meta, fd)

    def load(self, path: str) -> "HMMAggregator":
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        got = data["emission_probs"].shape
        want = (N_SOURCES, N_STATES, N_STATES)
        if tuple(got) != want:
            # the source/label registry changed since this checkpoint
            # was written (e.g. a new plug-in source): resuming would
            # index the emission tensor out of bounds MID-FIT — fail
            # here with the reason instead
            raise ValueError(
                f"checkpoint {path!r} has emission shape {tuple(got)} but the "
                f"current registry needs {want} (schema.SOURCE_NAMES/LABELS "
                "changed since it was written); delete stale checkpoints to "
                "retrain under the new registry"
            )
        self.startprob_prior = data["startprob_prior"]
        self.startprob_ = data["startprob"]
        self.transmat_prior = data["transmat_prior"]
        self.transmat_ = data["transmat"]
        self.emission_priors = data["emission_priors"]
        self.emission_probs = data["emission_probs"]
        meta_path = (path[:-4] if path.endswith(".npz") else path) + ".meta.json"
        if os.path.exists(meta_path):
            with open(meta_path) as fd:
                self.history = json.load(fd).get("history", [])
        return self

    # -- Spark driver loop -------------------------------------------------

    @staticmethod
    def _is_encoded(df: DataFrame) -> bool:
        return "obs_t" in df.columns

    def fit_spark(
        self,
        spark: SparkSession,
        annotated: DataFrame,
        checkpoint_dir: str | None = None,
        resume: bool = False,
        tree_combine: bool | str = "auto",
        combine_fanin: int = 32,
    ) -> "HMMAggregator":
        """Baum-Welch over an annotated DataFrame.

        Per iteration: ONE narrow mapInPandas pass emitting one
        partial-stats row per partition (map-side combine), then either
        a direct driver sum (few partitions) or a tree-combine level —
        a groupBy(partition_id % fanin) applyInPandas that pre-sums the
        ~2.3 MB obs matrices so the driver receives ``combine_fanin``
        rows instead of one per partition (O(fanin) driver traffic at
        any cluster size; at 10k partitions the flat collect would be
        ~23 GB). ``tree_combine="auto"`` turns the extra level on when
        defaultParallelism >= 128, so small/local runs skip the extra
        stage. Then numpy M-step, checkpoint, re-broadcast.

        Convergence follows the reference (hmmlearn ConvergenceMonitor,
        labelling.py:238): stop when the SIGNED logprob delta drops
        below ``tol``, an absolute criterion — a decrease also stops,
        with a logged warning mirroring hmmlearn's monitor, and
        ``n_iter`` caps the loop either way.
        """
        # the fit passes need only the token COUNT and the observation
        # payload: projecting the token strings out here keeps them off
        # the Arrow boundary for the prior pass and every EM iteration
        # (guide §4.1: pass only the columns the function needs). An
        # encode_observations() input additionally replaces the span
        # rows with precomputed sparse tensor cells, so the
        # layers/specialise/extract chain is not re-run per pass.
        encoded = self._is_encoded(annotated)
        if encoded:
            annotated = annotated.select(
                "n_tokens", "obs_t", "obs_s", "obs_k", "obs_v"
            )
        else:
            annotated = annotated.select(
                F.size("tokens").alias("n_tokens"), "spans"
            )

        start_iter = 0
        if resume and checkpoint_dir:
            latest = _latest_checkpoint(checkpoint_dir)
            if latest is not None:
                try:
                    self.load(latest[1])
                    start_iter = latest[0] + 1
                except ValueError as exc:
                    # registry-shape mismatch (load() validates): a
                    # checkpoint from an older SOURCE_NAMES/LABELS
                    # registry cannot be resumed — retrain from scratch
                    # instead of failing the job. The stale files are
                    # renamed to .stale FIRST: left in place, a retrain
                    # dying before it exceeds the stale run's iteration
                    # count would make every later resume re-pick the
                    # incompatible max-iteration file forever
                    logging.getLogger(__name__).warning(
                        "ignoring incompatible checkpoint and retraining: %s", exc
                    )
                    _quarantine_checkpoints(checkpoint_dir)

        if self.startprob_ is None:
            counts = _collect_prior_counts(
                annotated, self._best_coverage_source_index(), self._excluded,
                tree_combine=tree_combine, combine_fanin=combine_fanin,
                encoded=encoded,
            )
            self.initialise(*counts)
            if checkpoint_dir:
                self.save(os.path.join(checkpoint_dir, "iter_init"), -1, None)

        sc = spark.sparkContext
        prev_logprob = self.history[-1] if self.history else None
        for iteration in range(start_iter, self.n_iter):
            params_bc = sc.broadcast(
                (self.startprob_, self.transmat_, self.emission_probs,
                 self.emission_priors, self.startprob_prior, self.transmat_prior)
            )
            agg = self
            excluded = self._excluded

            def e_step_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                sp, tm, ep, epr, spp, tmp = params_bc.value
                model = HMMAggregator.__new__(HMMAggregator)
                model.startprob_, model.transmat_, model.emission_probs = sp, tm, ep
                model._excluded = excluded
                logprob = 0.0
                n_docs = 0
                n_tokens = 0
                start = np.zeros(N_STATES)
                trans = np.zeros((N_STATES, N_STATES))
                obs = np.zeros((N_SOURCES, N_STATES, N_STATES))
                for pdf in batches:
                    for n_toks, payload in _iter_observations(pdf, encoded):
                        if n_toks == 0:
                            continue
                        X = _materialize_X(payload, n_toks, encoded)
                        lp, st, tr, ob = model.e_step(X)
                        logprob += lp
                        start += st
                        trans += tr
                        obs += ob
                        n_docs += 1
                        n_tokens += int(n_toks)
                yield pd.DataFrame({
                    "logprob": [logprob], "n_docs": [n_docs], "n_tokens": [n_tokens],
                    "start": [start.tobytes()], "trans": [trans.tobytes()],
                    "obs": [obs.tobytes()],
                })

            schema = T.StructType([
                T.StructField("logprob", T.DoubleType()),
                T.StructField("n_docs", T.LongType()),
                T.StructField("n_tokens", T.LongType()),
                T.StructField("start", T.BinaryType()),
                T.StructField("trans", T.BinaryType()),
                T.StructField("obs", T.BinaryType()),
            ])
            stats = annotated.mapInPandas(e_step_partition, schema=schema)
            use_tree = tree_combine is True or (
                tree_combine == "auto" and sc.defaultParallelism >= 128
            )
            if use_tree:
                stats = _tree_combine_stats(stats, schema, combine_fanin)
            rows = stats.collect()
            params_bc.destroy()

            curr_logprob = sum(r["logprob"] for r in rows)
            start = sum(np.frombuffer(r["start"]).reshape(N_STATES) for r in rows)
            trans = sum(np.frombuffer(r["trans"]).reshape(N_STATES, N_STATES) for r in rows)
            obs = sum(np.frombuffer(r["obs"]).reshape(N_SOURCES, N_STATES, N_STATES) for r in rows)

            self.m_step(start, trans, obs)
            self.history.append(float(curr_logprob))
            if checkpoint_dir:
                self.save(os.path.join(checkpoint_dir, f"iter_{iteration:03d}"),
                          iteration, float(curr_logprob))
            if prev_logprob is not None and curr_logprob - prev_logprob < self.tol:
                if curr_logprob < prev_logprob:
                    # mirrors hmmlearn's ConvergenceMonitor warning: EM
                    # should be monotone, so a decrease usually means
                    # float reordering (tree-combine at high partition
                    # counts) or a degenerate init — stopping is still
                    # correct, but say so instead of stopping silently
                    logging.getLogger(__name__).warning(
                        "HMM logprob decreased (%.6f -> %.6f) at iteration %d;"
                        " stopping (model is not strictly converging)",
                        prev_logprob, curr_logprob, iteration,
                    )
                break
            prev_logprob = curr_logprob
        return self

    def decode_spark(self, spark: SparkSession, annotated: DataFrame) -> DataFrame:
        """Stateless Viterbi decode: annotated -> HMM mention rows."""
        params_bc = spark.sparkContext.broadcast(
            (self.startprob_, self.transmat_, self.emission_probs)
        )
        source_name = self.source_name
        excluded = self._excluded

        encoded = self._is_encoded(annotated)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sp, tm, ep = params_bc.value
            model = HMMAggregator.__new__(HMMAggregator)
            model.startprob_, model.transmat_, model.emission_probs = sp, tm, ep
            model._excluded = excluded
            for pdf in batches:
                rows = []
                for url, tokens, (n_toks, payload) in zip(
                    pdf["url"], pdf["tokens"], _iter_observations(pdf, encoded)
                ):
                    if n_toks == 0:
                        continue
                    X = _materialize_X(payload, n_toks, encoded)
                    path, confs = model.label(X)
                    for (s, e), (lab, conf) in decode_biluo(path, confs).items():
                        rows.append((url, source_name, s, e, lab, conf,
                                     " ".join(tokens[s:e])))
                yield pd.DataFrame(
                    rows,
                    columns=["url", "source", "start", "end", "label", "conf", "text"],
                )

        cols = ["url", "tokens", "n_tokens", "obs_t", "obs_s", "obs_k", "obs_v"] \
            if encoded else ["url", "tokens", "spans"]
        return annotated.select(*cols).mapInPandas(run, schema=MENTIONS_SCHEMA)


# ---------------------------------------------------------------------------
# Precomputed observation encoding (r7): the fit+decode flow re-ran the
# layers_from_spans -> specialise_layers -> extract_sequence chain once
# per pass (prior counts, every EM iteration, decode — 4x per doc for
# the benchmark's fit(2)+decode). encode_observations harvests the
# sparse cells of the FINAL tensor produced by the reference chain
# itself (every (t, source, state) where X differs from the all-O
# default), so reconstruction is exact by construction — asserted
# cell-for-cell by tests/test_hmm.py::test_encoded_observations_exact.
# ---------------------------------------------------------------------------

def encode_observations(annotated: DataFrame) -> DataFrame:
    """annotated(url, tokens, spans) -> (url, tokens, n_tokens,
    obs_t, obs_s, obs_k, obs_v): the per-doc observation tensor's
    non-default cells as parallel primitive arrays (Arrow-friendly —
    struct arrays would decode to per-cell python dicts).

    fit_spark/decode_spark detect the encoded columns and skip the
    span-to-tensor derivation per pass; persist the encoded frame once
    and feed it to both."""
    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, toks_out, n_tokens = [], [], []
            ats, ass, aks, avs = [], [], [], []
            for url, tokens, spans in zip(pdf["url"], pdf["tokens"], pdf["spans"]):
                n = len(tokens)
                urls.append(url)
                toks_out.append(list(tokens))
                n_tokens.append(n)
                if n == 0:
                    for a in (ats, ass, aks, avs):
                        a.append([])
                    continue
                X = sequence_from_spans(list(spans), n)
                base = np.zeros_like(X)
                base[:, :, 0] = 1.0
                t_i, s_i, k_i = np.nonzero(X != base)
                ats.append(t_i.astype(np.int32))
                ass.append(s_i.astype(np.int32))
                aks.append(k_i.astype(np.int32))
                avs.append(X[t_i, s_i, k_i])
            yield pd.DataFrame({
                "url": urls, "tokens": toks_out, "n_tokens": n_tokens,
                "obs_t": ats, "obs_s": ass, "obs_k": aks, "obs_v": avs,
            })

    schema = T.StructType([
        T.StructField("url", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("obs_t", T.ArrayType(T.IntegerType())),
        T.StructField("obs_s", T.ArrayType(T.IntegerType())),
        T.StructField("obs_k", T.ArrayType(T.IntegerType())),
        T.StructField("obs_v", T.ArrayType(T.FloatType())),
    ])
    return annotated.select("url", "tokens", "spans").mapInPandas(enc, schema=schema)


def _X_from_cells(n: int, ts, ss, ks, vs) -> np.ndarray:
    """Rebuild the dense float32 observation tensor from its
    non-default cells. Cell coordinates are unique (np.nonzero), so
    the scatter is order-free; values round-trip float32-exact."""
    X = np.zeros((n, N_SOURCES, N_STATES), dtype=np.float32)
    X[:, :, 0] = 1.0
    if len(ts):
        X[np.asarray(ts, dtype=np.int64), np.asarray(ss, dtype=np.int64),
          np.asarray(ks, dtype=np.int64)] = np.asarray(vs, dtype=np.float32)
    return X


def _iter_observations(pdf: pd.DataFrame, encoded: bool):
    """Yield (n_tokens, payload) per row for either input form."""
    if encoded:
        for n, t, s, k, v in zip(pdf["n_tokens"], pdf["obs_t"], pdf["obs_s"],
                                 pdf["obs_k"], pdf["obs_v"]):
            yield int(n), (t, s, k, v)
    elif "n_tokens" in pdf.columns:
        for n, spans in zip(pdf["n_tokens"], pdf["spans"]):
            yield int(n), spans
    else:  # decode path on raw annotated rows
        for tokens, spans in zip(pdf["tokens"], pdf["spans"]):
            yield len(tokens), spans


def _materialize_X(payload, n_toks: int, encoded: bool) -> np.ndarray:
    if encoded:
        t, s, k, v = payload
        return _X_from_cells(n_toks, t, s, k, v)
    return sequence_from_spans(list(payload), n_toks)


def _tree_combine_stats(stats: DataFrame, schema, fanin: int,
                        shapes: dict[str, tuple] | None = None) -> DataFrame:
    """Second aggregation level for one-row-per-partition partials:
    shuffle the stats rows to ``fanin`` groups and sum inside each with
    applyInPandas, bounding driver traffic at O(fanin) rows regardless
    of the input partition count. ``shapes`` names the BINARY columns
    (packed ndarrays) with their array shapes; every other column is
    summed numerically (floats stay float, ints stay int). Used by both
    the per-iteration E-step pass and the one-time prior-count pass."""
    if shapes is None:
        shapes = {
            "start": (N_STATES,),
            "trans": (N_STATES, N_STATES),
            "obs": (N_SOURCES, N_STATES, N_STATES),
        }
    fields = [(f.name, f.dataType.typeName()) for f in schema.fields]

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {}
        for name, typ in fields:
            if name in shapes:
                total = sum(np.frombuffer(b).reshape(shapes[name]) for b in pdf[name])
                out[name] = [total.tobytes()]
            elif typ in ("long", "integer"):
                out[name] = [int(pdf[name].sum())]
            else:
                out[name] = [pdf[name].sum()]
        return pd.DataFrame(out)

    return (
        stats
        .withColumn("g", F.spark_partition_id() % F.lit(fanin))
        .groupBy("g")
        .applyInPandas(lambda _key, pdf: combine(pdf), schema=schema)
    )


# ---------------------------------------------------------------------------
# Prior-count aggregation pass (fused replacement for the reference's
# three tee'd streams, labelling.py:248-252)
# ---------------------------------------------------------------------------

def _collect_prior_counts(
    annotated: DataFrame, best_source_index: int, excluded: np.ndarray | None = None,
    tree_combine: bool | str = "auto", combine_fanin: int = 32,
    encoded: bool = False,
):
    """One partial-counts row per partition, then (like the E-step) an
    optional tree-combine level: each row is ~78 KB of packed matrices,
    so a flat collect at 10k partitions would be ~780 MB of driver
    traffic — the same auto rule (defaultParallelism >= 128) bounds it
    at O(fanin) rows. One-time pass, not per-iteration."""
    def count_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        init = np.zeros(N_STATES)
        trans = np.zeros((N_STATES, N_STATES))
        obs = np.zeros((N_SOURCES, N_STATES))
        for pdf in batches:
            for n_toks, payload in _iter_observations(pdf, encoded):
                if n_toks == 0:
                    continue
                X = _materialize_X(payload, n_toks, encoded)
                if excluded is not None and len(excluded):
                    X[:, excluded, :] = 0.0
                    X[:, excluded, 0] = 1.0
                best = X[:, best_source_index, :].argmax(axis=1)
                init[best[0]] += 1
                np.add.at(trans, (best[:-1], best[1:]), 1.0)
                obs += X.sum(axis=0)
        yield pd.DataFrame({
            "init": [init.tobytes()], "trans": [trans.tobytes()], "obs": [obs.tobytes()],
        })

    schema = T.StructType([
        T.StructField("init", T.BinaryType()),
        T.StructField("trans", T.BinaryType()),
        T.StructField("obs", T.BinaryType()),
    ])
    stats = annotated.mapInPandas(count_partition, schema=schema)
    sc = annotated.sparkSession.sparkContext
    use_tree = tree_combine is True or (
        tree_combine == "auto" and sc.defaultParallelism >= 128
    )
    if use_tree:
        stats = _tree_combine_stats(
            stats, schema, combine_fanin,
            shapes={
                "init": (N_STATES,),
                "trans": (N_STATES, N_STATES),
                "obs": (N_SOURCES, N_STATES),
            },
        )
    rows = stats.collect()
    init = sum(np.frombuffer(r["init"]).reshape(N_STATES) for r in rows)
    trans = sum(np.frombuffer(r["trans"]).reshape(N_STATES, N_STATES) for r in rows)
    obs = sum(np.frombuffer(r["obs"]).reshape(N_SOURCES, N_STATES) for r in rows)
    return init, trans, obs


def _quarantine_checkpoints(checkpoint_dir: str) -> None:
    """Rename every iter_*.npz (incl. iter_init) to *.stale so
    _latest_checkpoint can never re-select a registry-incompatible
    run's files; renamed, not deleted, to keep them inspectable."""
    if not os.path.isdir(checkpoint_dir):
        return
    for name in os.listdir(checkpoint_dir):
        if name.startswith("iter_") and (
            name.endswith(".npz") or name.endswith(".meta.json")
        ):
            os.replace(
                os.path.join(checkpoint_dir, name),
                os.path.join(checkpoint_dir, name + ".stale"),
            )


def _latest_checkpoint(checkpoint_dir: str):
    if not os.path.isdir(checkpoint_dir):
        return None
    best = None
    for name in os.listdir(checkpoint_dir):
        if name.startswith("iter_") and name.endswith(".npz") and "init" not in name:
            it = int(name[5:8])
            if best is None or it > best[0]:
                best = (it, os.path.join(checkpoint_dir, name))
    return best
