"""Knowledge-graph stages: relation/triple extraction, entity linking,
minhash-LSH canonicalization, graph materialize (north_rule — new
capability layered on the reference's aggregated mentions).

Pipeline:
  mentions (HMM/majority-voter output) ──┐
                                         ├─ per-doc SVO-window rule (narrow)
  pages.tokens ──────────────────────────┘
      → raw triples (surface forms)
      → entity linking: broadcast join against the gazetteer KB
      → canonicalization: minhash-LSH over character shingles of
        UNLINKED surface forms; band groupBy; connected components via
        iterative smallest-id propagation; rewrite triples
      → dedup (groupBy max-conf) → write partitioned by pred.

Scale notes: linking is a broadcast hash join (dictionary ~10^6 rows);
LSH banding shuffles once on (band, signature); mega-buckets from
boilerplate are capped (drops counted, no silent truncation —
SURVEY.md §7.4); connected components is the classic O(log n)-round
iterative join with AQE handling skew.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql import types as T

from weak_supervision_for_ner_spark.functions.lexicons import LEGAL_SUFFIXES as _LEGAL_SUFFIXES
from weak_supervision_for_ner_spark.schema import TRIPLES_SCHEMA
from weak_supervision_for_ner_spark.sources.gazetteer import RELATION_LEXICON

ENTITY_TYPES = {"PERSON", "COMPANY", "ORG", "GPE", "LOC", "PRODUCT", "FAC", "EVENT", "NORP", "LAW"}

_MAX_PATTERN_LEN = max(len(k) for k in RELATION_LEXICON)

_PERSON_SUBJECT_PREDS = {"ceo_of", "born_in", "works_for"}

# Per-predicate subject-type constraints (None = any entity type).
_SUBJECT_TYPES = {
    "acquired": {"COMPANY", "ORG", "PERSON"},
    "merged_with": {"COMPANY", "ORG"},
    "invested_in": {"COMPANY", "ORG", "PERSON"},
    "partnered_with": {"COMPANY", "ORG"},
    "founded": {"PERSON", "COMPANY", "ORG"},
    "launched": {"COMPANY", "ORG", "PERSON"},
    "ceo_of": {"PERSON"},
    "born_in": {"PERSON"},
    "works_for": {"PERSON"},
    "joined": {"PERSON"},
    "leads": {"PERSON"},
    "met": {"PERSON"},
    "visited": {"PERSON", "NORP", "COMPANY", "ORG"},
    "signed": {"NORP", "PERSON", "COMPANY", "ORG", "GPE"},
    "based_in": {"COMPANY", "ORG"},
    "sued": {"COMPANY", "ORG", "PERSON", "GPE", "NORP"},
}

# Per-predicate object-type constraints: prevents "met <GPE>"-style
# noise when the true object is a non-entity ("met reporters in Oslo").
_OBJECT_TYPES = {
    "acquired": {"COMPANY", "ORG"},
    "merged_with": {"COMPANY", "ORG"},
    "invested_in": {"COMPANY", "ORG"},
    "partnered_with": {"COMPANY", "ORG"},
    "founded": {"COMPANY", "ORG"},
    "joined": {"COMPANY", "ORG"},
    "leads": {"COMPANY", "ORG"},
    "works_for": {"COMPANY", "ORG"},
    "ceo_of": {"COMPANY", "ORG"},
    "launched": {"PRODUCT"},
    "born_in": {"GPE", "LOC"},
    "based_in": {"GPE", "LOC"},
    "visited": {"GPE", "LOC", "FAC"},
    "met": {"PERSON"},
    "signed": {"LAW", "EVENT"},
    "sued": {"COMPANY", "ORG", "PERSON"},
}


def extract_triples_from_doc(
    url: str, tokens: list[str], mentions: list[tuple[int, int, str, float]]
) -> list[tuple]:
    """Deterministic SVO-window rule over one document's aggregated
    mentions: subject mention — relation phrase — object mention, all
    within one sentence window, nearest mentions on each side."""
    lower = [t.lower() for t in tokens]
    n = len(tokens)
    ents = sorted(
        (s, e, lab, conf)
        for (s, e, lab, conf) in mentions
        if lab in ENTITY_TYPES
        # drop fragment mentions that are a bare legal suffix ("GmbH"):
        # majority voting can split "Pied Piper GmbH" into two spans
        and not all(
            lower[t].rstrip(".") in _LEGAL_SUFFIXES for t in range(s, min(e, n))
        )
    )
    if not ents:
        return []

    # Merge adjacent same-label mentions (merge_contiguous_spans
    # semantics, annotations.py:1312-1330): majority voting can split
    # one entity at a gazetteer boundary ("PlayStation" + "5").
    merged = [ents[0]]
    for m in ents[1:]:
        last = merged[-1]
        if m[0] == last[1] and m[2] == last[2]:
            merged[-1] = (last[0], m[1], last[2], min(last[3], m[3]))
        else:
            merged.append(m)
    ents = merged

    # Sentence boundaries (token indices of terminators)
    boundaries = [i for i, t in enumerate(tokens) if t in {".", "!", "?"}]

    def same_sentence(a: int, b: int) -> bool:
        return not any(a <= x < b for x in boundaries)

    out = []
    i = 0
    while i < n:
        matched = None
        for plen in range(min(_MAX_PATTERN_LEN, n - i), 0, -1):
            pred = RELATION_LEXICON.get(tuple(lower[i : i + plen]))
            if pred is not None:
                matched = (pred, i, i + plen)
                break
        if matched is None:
            i += 1
            continue
        pred, vs, ve = matched
        allowed_subj = _SUBJECT_TYPES.get(pred)
        subj_cands = [
            m for m in ents
            if m[1] <= vs and same_sentence(m[1] - 1, vs)
            and (allowed_subj is None or m[2] in allowed_subj)
        ]
        # Person-anchored predicates prefer the nearest PERSON subject:
        # "X is the CEO of Y and was born in Z" must not attach Y as
        # the born_in subject just because it is nearer to the verb.
        if pred in _PERSON_SUBJECT_PREDS:
            person_cands = [m for m in subj_cands if m[2] == "PERSON"]
            if person_cands:
                subj_cands = person_cands
        subj = max(subj_cands, key=lambda m: m[1], default=None)
        allowed = _OBJECT_TYPES.get(pred)
        obj = min(
            (m for m in ents
             if m[0] >= ve and same_sentence(ve, m[0])
             and (allowed is None or m[2] in allowed)),
            key=lambda m: m[0], default=None,
        )
        if subj is not None and obj is not None:
            out.append((
                " ".join(tokens[subj[0]:subj[1]]), subj[2], pred,
                " ".join(tokens[obj[0]:obj[1]]), obj[2], url,
                round(min(subj[3], obj[3]), 3),
            ))
        i = ve
    return out


def extract_triples_direct(pages: DataFrame, nb_sources_threshold: int = 4,
                           lang: str = "en", truecase: bool = False,
                           form_freqs: dict | None = None,
                           correct: bool = False) -> DataFrame:
    """Maximal fusion: pages → annotate → specialise → majority-vote →
    [entity-correct] → SVO triples in ONE Arrow stage. On the graph
    path the span table never crosses the Arrow boundary at all — used
    by the pipeline when the aggregator is per-doc recomputable
    (majority voting).

    ``truecase`` derives the corpus casing dictionary (one groupBy +
    bounded collect) and broadcasts it, exactly like ``annotate_pages``
    (pass ``form_freqs`` to reuse a precomputed dictionary — at real
    scale derive it once and ship it). ``correct`` applies the 15-rule
    entity-repair pass (spacy_wrapper.py:268-402) to the aggregated
    mentions per doc — still row-local, so the stage stays narrow."""
    from weak_supervision_for_ner_spark.operators.aggregate import (
        decode_biluo,
        layers_from_spans,
        majority_vote_sparse,
        specialise_layers,
    )
    from weak_supervision_for_ner_spark.operators.annotate import annotate_batch
    from weak_supervision_for_ner_spark.operators.entity_correction import (
        correct_spans_with_conf,
    )

    selected = pages.filter(F.col("lang") == lang).select("url", "text")
    bc = None
    if truecase or form_freqs is not None:
        if form_freqs is None:
            from weak_supervision_for_ner_spark.operators.textstats import (
                collect_form_frequency_dict,
            )

            form_freqs = collect_form_frequency_dict(selected)
        bc = selected.sparkSession.sparkContext.broadcast(form_freqs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        freqs = bc.value if bc is not None else None
        for pdf in batches:
            rows = []
            for url, (tokens, spans) in zip(
                pdf["url"], annotate_batch(pdf["text"], form_freqs=freqs)
            ):
                layers = specialise_layers(layers_from_spans(spans))
                states, confs = majority_vote_sparse(
                    layers, len(tokens), nb_sources_threshold
                )
                ments = [
                    (s, e, lab, conf)
                    for (s, e), (lab, conf) in decode_biluo(states, confs).items()
                ]
                if correct:
                    ments = correct_spans_with_conf(tokens, ments)
                rows.extend(extract_triples_from_doc(url, tokens, ments))
            yield pd.DataFrame(
                rows,
                columns=["subj", "subj_type", "pred", "obj", "obj_type", "url", "conf"],
            )

    return selected.mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_triples_fused(annotated: DataFrame, nb_sources_threshold: int = 4,
                          correct: bool = False) -> DataFrame:
    """Zero-shuffle triple extraction: re-derive the majority-voter
    mentions per doc (cheap vectorized numpy) INSIDE the same Arrow
    batch and run the SVO rule — the whole pages→triples path stays one
    narrow stage. Preferred in the pipeline over
    :func:`extract_triples`, which exists for aggregators whose
    mentions are not per-doc recomputable (e.g. a trained HMM).
    ``correct`` applies the 15-rule repair pass per doc first."""
    from weak_supervision_for_ner_spark.operators.aggregate import (
        decode_biluo,
        layers_from_spans,
        majority_vote_sparse,
        specialise_layers,
    )
    from weak_supervision_for_ner_spark.operators.entity_correction import (
        correct_spans_with_conf,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, tokens, spans in zip(pdf["url"], pdf["tokens"], pdf["spans"]):
                tokens = list(tokens)
                layers = specialise_layers(layers_from_spans(list(spans)))
                states, confs = majority_vote_sparse(
                    layers, len(tokens), nb_sources_threshold
                )
                ments = [
                    (s, e, lab, conf)
                    for (s, e), (lab, conf) in decode_biluo(states, confs).items()
                ]
                if correct:
                    ments = correct_spans_with_conf(tokens, ments)
                rows.extend(extract_triples_from_doc(url, tokens, ments))
            yield pd.DataFrame(
                rows,
                columns=["subj", "subj_type", "pred", "obj", "obj_type", "url", "conf"],
            )

    return annotated.mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_triples_hmm_fused(annotated: DataFrame, model,
                              correct: bool = False) -> DataFrame:
    """Decode-fused HMM-path triple extraction: Viterbi-decode the
    trained model and run [entity-correct →] the SVO rule per doc in
    ONE Arrow stage over the annotated table — no mentions shuffle, no
    join back (the HMM-path counterpart of :func:`extract_triples_fused`;
    the trained params travel as a broadcast like ``decode_spark``).
    Produces the same graph as ``extract_triples(annotated,
    model.decode_spark(...))`` — asserted by the parity test."""
    from weak_supervision_for_ner_spark.operators.aggregate import (
        decode_biluo,
        sequence_from_spans,
    )
    from weak_supervision_for_ner_spark.operators.entity_correction import (
        correct_spans_with_conf,
    )

    params_bc = annotated.sparkSession.sparkContext.broadcast(
        (model.startprob_, model.transmat_, model.emission_probs)
    )
    excluded = model._excluded
    model_cls = type(model)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sp, tm, ep = params_bc.value
        m = model_cls.__new__(model_cls)
        m.startprob_, m.transmat_, m.emission_probs = sp, tm, ep
        m._excluded = excluded
        for pdf in batches:
            rows = []
            for url, tokens, spans in zip(pdf["url"], pdf["tokens"], pdf["spans"]):
                tokens = list(tokens)
                if not tokens:
                    continue
                X = sequence_from_spans(list(spans), len(tokens))
                path, confs = m.label(X)
                ments = [
                    (s, e, lab, conf)
                    for (s, e), (lab, conf) in decode_biluo(path, confs).items()
                ]
                if correct:
                    ments = correct_spans_with_conf(tokens, ments)
                rows.extend(extract_triples_from_doc(url, tokens, ments))
            yield pd.DataFrame(
                rows,
                columns=["subj", "subj_type", "pred", "obj", "obj_type", "url", "conf"],
            )

    return annotated.mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_triples(annotated: DataFrame, mentions: DataFrame,
                    correct: bool = False) -> DataFrame:
    """Join aggregated mentions back onto tokens (co-partitioned equi
    join on url) and run [entity-correct →] the SVO rule per doc
    inside Arrow batches."""
    from weak_supervision_for_ner_spark.operators.entity_correction import (
        correct_spans_with_conf,
    )

    grouped = mentions.groupBy("url").agg(
        F.collect_list(F.struct("start", "end", "label", "conf")).alias("ms")
    )
    joined = annotated.select("url", "tokens").join(grouped, "url")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, tokens, ms in zip(pdf["url"], pdf["tokens"], pdf["ms"]):
                tokens = list(tokens)
                ments = [
                    (int(m["start"]), int(m["end"]), m["label"], float(m["conf"]))
                    if isinstance(m, dict) else (int(m[0]), int(m[1]), m[2], float(m[3]))
                    for m in ms
                ]
                if correct:
                    ments = correct_spans_with_conf(tokens, ments)
                rows.extend(extract_triples_from_doc(url, tokens, ments))
            yield pd.DataFrame(
                rows,
                columns=["subj", "subj_type", "pred", "obj", "obj_type", "url", "conf"],
            )

    return joined.mapInPandas(run, schema=TRIPLES_SCHEMA)


# ---------------------------------------------------------------------------
# Entity linking (broadcast dictionary join)
# ---------------------------------------------------------------------------

def link_entities(spark: SparkSession, triples: DataFrame) -> DataFrame:
    """Attach stable KB ids by normalized surface form; unlinked
    entities keep a surface-form id to be canonicalized by LSH."""
    from weak_supervision_for_ner_spark.sources.gazetteer import canonical_entity_ids

    ids = canonical_entity_ids()
    out = triples
    if len(ids) <= 10_000:
        # Small dictionary: a literal MAP lookup folds into the existing
        # projection — zero joins, zero extra stages. (The reference's
        # in-process dict lookup, expressed in Catalyst.)
        entries = [x for k, v in sorted(ids.items()) for x in (F.lit(k), F.lit(v))]
        kb_map = F.create_map(*entries)
        for side in ("subj", "obj"):
            norm = F.lower(F.regexp_replace(F.col(side), r"\s+", " "))
            out = (
                out.withColumn(f"{side}_norm", norm)
                .withColumn(f"{side}_kb", F.element_at(kb_map, F.col(f"{side}_norm")))
            )
        return out
    # Large KB: Arrow-backed LocalRelation (no Python-RDD stage per
    # broadcast exchange) + broadcast hash joins.
    kb = spark.createDataFrame(
        pd.DataFrame(sorted(ids.items()), columns=["surface", "kb_id"])
    )
    for side in ("subj", "obj"):
        out = (
            out
            .withColumn(f"{side}_norm", F.lower(F.regexp_replace(F.col(side), r"\s+", " ")))
            .join(
                F.broadcast(kb.withColumnRenamed("surface", f"{side}_norm")
                              .withColumnRenamed("kb_id", f"{side}_kb")),
                on=f"{side}_norm", how="left",
            )
        )
    return out


# ---------------------------------------------------------------------------
# MinHash-LSH canonicalization of unlinked surface forms
# ---------------------------------------------------------------------------

def _shingle_expr(col: str, k: int = 3):
    """Character k-shingles of a normalized string as an array column
    (built-in functions only — stays in codegen)."""
    padded = F.concat(F.lit("^"), F.col(col), F.lit("$"))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(padded) - (k - 1), F.lit(1))),
            lambda i: padded.substr(i, F.lit(k)),
        )
    )


def minhash_signatures(
    entities: DataFrame, id_col: str = "name", n_hashes: int = 16, k: int = 3
) -> DataFrame:
    """Minhash signature per entity string: min(xxhash64(seed, shingle))
    per permutation — all JVM-side built-ins, no UDF."""
    sh = entities.withColumn("shingles", _shingle_expr(id_col, k))
    sig_cols = [
        F.array_min(F.transform("shingles", lambda s: F.xxhash64(F.lit(i), s))).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return sh.select(id_col, *sig_cols)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "name", n_hashes: int = 16,
    bands: int = 4, max_bucket: int = 64, stats: dict | None = None,
) -> DataFrame:
    """Band the signatures, groupBy (band, key) and emit intra-bucket
    pairs. Buckets above ``max_bucket`` are dropped (skew guard for
    boilerplate mega-buckets); pass ``stats`` (a dict) to have the drop
    COUNTED — it is filled with ``dropped_buckets``/``dropped_members``
    via one extra small aggregation job, so truncation is observable in
    lineage instead of silent.

    Banding is a single pass: the per-band bucket keys become an array
    column that is exploded — no n-way union re-reading the input."""
    rows_per_band = n_hashes // bands
    band_keys = F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[f"h{i}" for i in range(b * rows_per_band, (b + 1) * rows_per_band)]).alias("bucket"),
        )
        for b in range(bands)
    ])
    banded = (
        signatures.select(F.col(id_col), F.explode(band_keys).alias("bk"))
        .select(id_col, F.col("bk.band").alias("band"), F.col("bk.bucket").alias("bucket"))
    )

    bucketed = banded.groupBy("band", "bucket").agg(
        F.collect_list(id_col).alias("members"), F.count(F.lit(1)).alias("sz")
    )
    if stats is not None:
        # one extra small job recomputing the bucket aggregation —
        # cheaper than pinning the collect_list buckets in executor
        # storage for the rest of the application (stats mode is a
        # lineage diagnostic, not the hot path)
        dropped = (
            bucketed.filter(F.col("sz") > max_bucket)
            .agg(F.count(F.lit(1)).alias("nb"), F.coalesce(F.sum("sz"), F.lit(0)).alias("nm"))
            .collect()[0]
        )
        stats["dropped_buckets"] = int(dropped["nb"])
        stats["dropped_members"] = int(dropped["nm"])
    kept = bucketed.filter(F.col("sz") <= max_bucket)
    # Intra-bucket pairs: double explode is fine because buckets are
    # capped at max_bucket members.
    pairs = (
        kept
        .select(F.explode("members").alias("a"), F.col("members"))
        .select("a", F.explode("members").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    return pairs


def connected_components(
    pairs: DataFrame, max_rounds: int = 3, convergence_check: bool = False,
    stats: dict | None = None,
) -> DataFrame:
    """Smallest-id label propagation over an undirected pair list.
    Returns (name, canonical).

    Default mode unrolls ``max_rounds`` propagation joins LAZILY into
    one plan — a single action executes the whole loop, so the
    per-round job/checkpoint overhead that dominates at small scale
    disappears. LSH near-dup chains have tiny diameter, so 3 rounds
    converge in practice. ``convergence_check=True`` switches to the
    classic materialize-per-round loop (localCheckpoint + changed
    count) for unbounded components — use it when component diameter
    is unknown (and set a cluster checkpoint dir at real scale). That
    mode also POINTER-JUMPS after each propagation (canonical <-
    label[canonical], one extra self-join on the label table), so the
    rounds needed grow with log2(diameter), not the diameter itself:
    ``max_rounds`` = 30 certifies convergence for any component that
    fits on disk, and chain graphs (the worst case for plain
    propagation) converge in ~log2(n) rounds.

    Pass ``stats`` (a dict) to make non-convergence OBSERVABLE in lazy
    mode: after the unrolled rounds one extra propagation runs and
    ``stats['unconverged_labels']`` records how many labels would still
    change — 0 certifies the rounds sufficed; >0 means components with
    diameter beyond the budget were split (switch to
    ``convergence_check=True`` for those corpora)."""
    # Symmetric edges from ONE explode pass, not a self-union (a
    # self-union of an uncached upstream computes it twice in one job).
    edges = (
        pairs.select(
            F.explode(F.array(
                F.struct(F.col("a").alias("x"), F.col("b").alias("y")),
                F.struct(F.col("b").alias("x"), F.col("a").alias("y")),
            )).alias("e")
        )
        .select("e.x", "e.y")
    ).persist()
    edges.count()  # materialize once: rounds below re-scan the cache
    labels = (
        edges.groupBy("x").agg(F.min("y").alias("min_y"))
        .select(F.col("x").alias("name"),
                F.least(F.col("min_y"), F.col("x")).alias("canonical"))
    )
    converged = False
    for _ in range(max_rounds):
        # propagate: new label = min over neighbours' labels and own
        neigh = (
            edges.join(labels.withColumnRenamed("name", "y"), on="y")
            .groupBy("x").agg(F.min("canonical").alias("n_min"))
        )
        new_labels = (
            labels.join(neigh.withColumnRenamed("x", "name"), on="name", how="left")
            .select(
                "name",
                F.least(F.col("canonical"), F.coalesce("n_min", "canonical")).alias("canonical"),
            )
        )
        if convergence_check:
            # Materialize the propagation BEFORE the pointer-jump
            # self-join — an uncached self-join would run the edge join
            # twice in one action.
            new_labels = new_labels.localCheckpoint()
            # Pointer jumping (path halving): canonical <- label[canonical].
            # Every canonical id is itself a node (it came from some
            # node's min), so the left join finds at most one row;
            # least() is belt-and-braces against identity rows. This is
            # what turns per-round progress from 1 hop into doubling —
            # rounds needed ~ log2(diameter).
            jump = new_labels.select(
                F.col("name").alias("canonical"), F.col("canonical").alias("jc")
            )
            new_labels = (
                new_labels.join(jump, on="canonical", how="left")
                .select(
                    "name",
                    F.least(
                        F.col("canonical"), F.coalesce("jc", "canonical")
                    ).alias("canonical"),
                )
            )
            new_labels = new_labels.localCheckpoint()
            changed = (
                new_labels.alias("n").join(labels.alias("o"), on="name")
                .filter(F.col("n.canonical") != F.col("o.canonical"))
                .limit(1).count()
            )
            if changed == 0:
                labels = new_labels
                converged = True
                break
        labels = new_labels
    if convergence_check:
        # every round's labels are localCheckpointed, so the final
        # result no longer depends on the edges cache — release it
        edges.unpersist()
        if not converged:
            # exhausting the round budget in convergence mode means the
            # caller asked for exact components (e.g. dedup survivors —
            # stopping early silently retains duplicates); fail loudly.
            raise RuntimeError(
                f"connected_components did not converge within {max_rounds} rounds;"
                " raise max_rounds (component diameter exceeds the budget)"
            )
    if stats is not None and not convergence_check:
        labels = labels.localCheckpoint()
        neigh = (
            edges.join(labels.withColumnRenamed("name", "y"), on="y")
            .groupBy("x").agg(F.min("canonical").alias("n_min"))
        )
        stats["unconverged_labels"] = (
            labels.join(neigh.withColumnRenamed("x", "name"), on="name")
            .filter(F.col("n_min") < F.col("canonical"))
            .count()
        )
        # labels are checkpointed and the stats job has run: the edges
        # cache is no longer reachable from anything returned — free it
        edges.unpersist()
    return labels


def _local_components(
    sig_rows: list, n_hashes: int, bands: int, max_bucket: int,
    stats: dict | None,
) -> dict[str, str]:
    """Driver-side banding + union-find over a COLLECTED signature
    table: identical connectivity to lsh_candidate_pairs +
    connected_components (same bands, same bucket-size cap, smallest-id
    representative), but exact to full convergence and zero extra Spark
    jobs. Used when the unlinked-entity set is small enough to collect."""
    rows_per_band = n_hashes // bands
    buckets: dict[tuple, list[str]] = {}
    for row in sig_rows:
        for b in range(bands):
            key = (b,) + tuple(
                row[f"h{i}"] for i in range(b * rows_per_band, (b + 1) * rows_per_band)
            )
            buckets.setdefault(key, []).append(row["name"])

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    dropped_buckets = dropped_members = 0
    for members in buckets.values():
        if len(members) > max_bucket:
            dropped_buckets += 1
            dropped_members += len(members)
            continue
        for m in members[1:]:
            union(members[0], m)
    if stats is not None:
        stats["dropped_buckets"] = dropped_buckets
        stats["dropped_members"] = dropped_members
        stats["unconverged_labels"] = 0  # union-find is exact
    # name -> smallest-id representative; identity mappings included
    # (the rewrite coalesces them to the same id either way)
    return {name: find(name) for name in {r["name"] for r in sig_rows}}


def canonicalize_triples(
    spark: SparkSession, linked: DataFrame, n_hashes: int = 16, bands: int = 4,
    stats: dict | None = None, driver_threshold: int = 100_000,
    max_bucket: int = 64,
) -> DataFrame:
    """Map every unlinked surface form to a canonical representative
    via minhash-LSH + connected components, then finalize ids.

    Two physical strategies behind one semantics:
    - unlinked entity set <= ``driver_threshold`` distinct names (the
      common case — unique UNLINKED surface forms grow far slower than
      the corpus): minhash signatures are still computed distributed,
      but the tiny signature table is collected and banded/union-found
      on the driver, and the resulting component map joins back as an
      Arrow LocalRelation broadcast — replacing ~6 small shuffle jobs
      whose per-stage orchestration dominated wall-clock. Exact to full
      convergence.
    - above the threshold: the fully distributed path
      (lsh_candidate_pairs -> connected_components), one shuffle on the
      band key, label propagation with a bounded round budget.

    With ``stats`` provided, LSH mega-bucket drops and CC
    non-convergence counts are recorded there (and surfaced through the
    pipeline's lineage log) so neither truncation is silent."""
    linked = linked.persist()  # read by the LSH pass and the final rewrite
    # Single-pass extraction of unlinked surface forms (explode, not a
    # self-union that would double-compute the uncached upstream).
    unlinked = (
        linked.select(
            F.explode(F.array(
                F.when(F.col("subj_kb").isNull(), F.col("subj_norm")),
                F.when(F.col("obj_kb").isNull(), F.col("obj_norm")),
            )).alias("name")
        )
        .filter(F.col("name").isNotNull())
        .distinct()
    )
    sigs = minhash_signatures(unlinked, "name", n_hashes)
    # ONE job decides the physical strategy: collect at most
    # threshold+1 signature rows; overflow switches to the distributed
    # path (which recomputes sigs — only ever paid in the huge case)
    sig_rows = sigs.limit(driver_threshold + 1).collect()
    if len(sig_rows) <= driver_threshold:
        mapping = _local_components(sig_rows, n_hashes, bands, max_bucket, stats)
        components = spark.createDataFrame(
            pd.DataFrame(
                sorted(mapping.items()) or [("", "")],
                columns=["name", "canonical"],
            )
        )
        if not mapping:
            components = components.filter(F.col("name") != "")
        components = F.broadcast(components)
    else:
        pairs = lsh_candidate_pairs(
            sigs, "name", n_hashes, bands, max_bucket=max_bucket, stats=stats
        )
        # The component table joins into BOTH the subj and obj rewrites;
        # eager localCheckpoint materializes the whole LSH+CC subtree
        # once and truncates its (deep, unrolled-round) lineage —
        # without it the entire canonicalization executed twice.
        components = connected_components(pairs, stats=stats).localCheckpoint()

    out = linked
    for side in ("subj", "obj"):
        comp = components.select(
            F.col("name").alias(f"{side}_norm"),
            F.col("canonical").alias(f"{side}_canon"),
        )
        out = out.join(comp, on=f"{side}_norm", how="left")
        out = out.withColumn(
            f"{side}_id",
            F.coalesce(
                F.col(f"{side}_kb"),
                F.concat(F.lit("ent:"), F.coalesce(F.col(f"{side}_canon"), F.col(f"{side}_norm"))),
            ),
        )
    return out


def materialize_graph(canonical: DataFrame) -> DataFrame:
    """Final (subj, pred, obj) edge table: dedup per (ids, url) keeping
    max confidence, canonical column order (TRIPLES_SCHEMA + ids).

    The surface-form tiebreak (two variants of one entity collapsing to
    the same ids at equal conf) is deterministic — ordered by the
    remaining columns — so the output is stable across partitionings,
    retries and engines (the single-node oracle mirrors the same
    ordering)."""
    w = Window.partitionBy("subj_id", "pred", "obj_id", "url").orderBy(
        F.desc("conf"), "subj", "subj_type", "obj", "obj_type"
    )
    return (
        canonical
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "subj", "subj_type", "pred", "obj", "obj_type", "url", "conf",
            "subj_id", "obj_id",
        )
    )


def write_graph(graph: DataFrame, target: str, fmt: str = "parquet") -> None:
    """Graph sink, pred-partitioned for predicate pruning; url-hash
    salted so hot domains don't serialize one writer (SURVEY.md §4).
    ``fmt="iceberg"`` writes to a catalog table via
    writeTo/overwritePartitions (sinks.write_table)."""
    from weak_supervision_for_ner_spark.sinks import write_table

    write_table(graph, target, fmt=fmt, partition_by=("pred",),
                bucket_col="url")
