"""End-to-end KG-construction pipeline assembly + lineage metrics.

`run_kg_pipeline` is the flagship job (north_rule): pages → annotate
(one narrow stage) → aggregate (majority voter or HMM) → triples →
link → canonicalize → graph. Stage boundaries persist/checkpoint so a
failed run resumes mid-pipeline, and per-stage counters land in a
metrics table.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from weak_supervision_for_ner_spark.operators.aggregate import majority_voter_mentions
from weak_supervision_for_ner_spark.operators.annotate import (
    annotate_pages,
    mentions_from_annotated,
)
from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator
from weak_supervision_for_ner_spark.operators.triples import (
    canonicalize_triples,
    extract_triples,
    extract_triples_direct,
    extract_triples_fused,
    extract_triples_hmm_fused,
    link_entities,
    materialize_graph,
)


class Lineage:
    """Per-stage counters + timings, persisted as JSON next to the
    output (north_rule: per-partition lineage + metrics). Row counts
    come from Spark actions; partition counts from the plan."""

    def __init__(self, path: str | None = None):
        self.path = path
        self.records: list[dict] = []

    def stage(self, name: str, df: DataFrame | None = None, **extra) -> None:
        # NOTE: never call df.rdd here — under AQE, materializing the
        # RDD executes the whole query just to read its partitioning.
        rec = {"stage": name, "ts": time.time(), **extra}
        self.records.append(rec)
        if self.path:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w") as fd:
                json.dump(self.records, fd, indent=1)


def stage_metrics(annotated: DataFrame) -> DataFrame:
    """Per-partition lineage counters for the annotation stage
    (north_rule: per-partition lineage + metrics): docs, tokens, spans
    and quarantined docs (error-isolated: tokens but zero spans)."""
    return (
        annotated
        .groupBy(F.spark_partition_id().alias("partition"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size("tokens")).alias("n_tokens"),
            F.sum(F.size("spans")).alias("n_spans"),
            F.sum(
                F.when((F.size("tokens") > 3) & (F.size("spans") == 0), 1).otherwise(0)
            ).alias("n_quarantined"),
        )
    )


def _input_identity(pages: DataFrame) -> str:
    """Cheap corpus identity for the stage_dir fingerprint. File/table
    inputs: an md5 over the sorted source-file list PLUS each file's
    (size, mtime) where the filesystem exposes them (driver-side
    metadata only — no job, so it is free at 100 TB). Any add/remove of
    a split changes the path list; an in-place same-name rewrite (a
    non-Spark regeneration emitting identical part names) changes
    size/mtime, so stale stages are not silently reused (r4 advice).
    For remote URIs whose metadata isn't reachable from the driver's
    local FS the entry degrades to the bare path — note that object
    stores' immutable-part naming makes same-path rewrites a non-issue
    there. By design the identity is the FILES, not the plan on top of
    them — two runs reading the same snapshot through different
    filters share stages. In-memory inputs (tests, synth corpora) have
    no files; fall back to one cheap content-hash job (count +
    order-independent xxhash64 over url/text) — a bare row count would
    collide for any two same-size corpora, which is exactly the
    stale-reuse case the fingerprint exists to catch."""
    files = sorted(pages.inputFiles())
    if files:
        entries = []
        for f in files:
            local = f[7:] if f.startswith("file://") else f
            try:
                st = os.stat(local)
                entries.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
            except OSError:
                entries.append(f)
        h = hashlib.md5("\n".join(entries).encode()).hexdigest()
        return f"files:{len(files)}:{h}"
    agg = pages.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-independent and cannot overflow under ANSI
        # mode (sum(xxhash64) throws ARITHMETIC_OVERFLOW on Spark 4)
        F.expr("bit_xor(xxhash64(url, text))").alias("h"),
    ).collect()[0]
    return f"rows:{agg['n']}:{agg['h']}"


def _stage_materialize(
    spark: SparkSession, stage_dir: str, name: str, df: DataFrame,
    lineage: "Lineage",
) -> DataFrame:
    """Durable stage checkpoint: write-once parquet keyed by the
    parquet _SUCCESS commit marker; an already-committed stage is read
    back instead of recomputed. (Local-FS check — swap for the Hadoop
    FileSystem API when stage_dir is on HDFS/S3.)"""
    path = os.path.join(stage_dir, name)
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        lineage.stage(f"stage_resume_{name}")
    else:
        df.write.mode("overwrite").parquet(path)
        lineage.stage(f"stage_commit_{name}")
    return spark.read.parquet(path)


def run_kg_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    aggregator: str = "majority",
    hmm_iters: int = 3,
    checkpoint_dir: str | None = None,
    lineage_path: str | None = None,
    with_metrics: bool = False,
    mentions_consumed: bool = False,
    truecase: bool = True,
    entity_correction: bool = True,
    form_freqs: dict | None = None,
    stage_dir: str | None = None,
):
    """pages -> (annotated, mentions, graph) DataFrames.

    aggregator: 'majority' (stateless, zero extra passes) or 'hmm'
    (EM driver loop; params checkpointed per iteration).

    ``truecase`` (default ON, mirroring the reference pipe which
    truecases every ≤25-token doc during parsing,
    spacy_wrapper.py:186-221): derive the corpus casing dictionary ONCE
    (one groupBy + bounded driver collect) and broadcast it to every
    annotation stage; pass ``form_freqs`` to reuse a precomputed
    dictionary (at 100 TB derive it once per corpus snapshot, not per
    run). ``entity_correction`` (default ON, mirroring
    spacy_wrapper.py:268-402 which repairs entities after every model
    annotation): apply the 15-rule boundary/type repair to the
    aggregated layer before triple extraction — per-doc pure function,
    fused into the extraction stage, so neither default adds a shuffle.

    ``mentions_consumed``: set True when the caller will materialize
    the mentions/annotated tables as well as the graph (e.g.
    --mentions-out). The majority-path triple extraction then reads the
    PERSISTED annotated table (labelling runs exactly once in total)
    instead of the pages-fused stage, which is fastest when the graph
    is the only output but would re-run the 35-function labelling
    stage if annotated is also materialized.

    ``stage_dir``: durable MID-PIPELINE resume (north_rule). Each major
    stage output (annotated, mentions) is written to
    ``{stage_dir}/{stage}`` as parquet on first completion; a re-run
    finds the committed stage (parquet _SUCCESS marker) and READS it
    instead of recomputing — so a job that died during canonicalization
    restarts without re-running the labelling or aggregation stages at
    all (the HMM additionally resumes EM mid-training from
    ``checkpoint_dir``). Stage files are the job's own durable
    checkpoints; clean them up after the final sink commits.
    """
    lineage = Lineage(lineage_path)

    if stage_dir:
        # Stage outputs are only valid for the configuration AND INPUT
        # that produced them: a re-run with a different aggregator or
        # truecase/correction setting — or pointed at a different
        # corpus — silently reading stale stages would return the OLD
        # run's results under the new run's name.
        fingerprint = {
            "aggregator": aggregator, "truecase": truecase,
            "entity_correction": entity_correction, "hmm_iters": hmm_iters,
            "input": _input_identity(pages),
        }
        fp_path = os.path.join(stage_dir, "pipeline_config.json")
        if os.path.exists(fp_path):
            with open(fp_path) as fd:
                committed = json.load(fd)
            if committed != fingerprint:
                raise ValueError(
                    f"stage_dir {stage_dir!r} holds stages committed by a run "
                    f"with config {committed}, but this run asks for "
                    f"{fingerprint}; resuming would silently return the old "
                    "configuration's results — clear the stage_dir or match "
                    "the original flags"
                )
        else:
            os.makedirs(stage_dir, exist_ok=True)
            with open(fp_path, "w") as fd:
                json.dump(fingerprint, fd)

    if truecase and form_freqs is None:
        from weak_supervision_for_ner_spark.operators.textstats import (
            collect_form_frequency_dict,
        )

        ff_path = os.path.join(stage_dir, "form_freqs.json") if stage_dir else None
        if ff_path and os.path.exists(ff_path):
            with open(ff_path) as fd:
                form_freqs = json.load(fd)
            lineage.stage("truecase_dict_resumed", n_forms=len(form_freqs))
        else:
            form_freqs = collect_form_frequency_dict(
                pages.filter(F.col("lang") == "en").select("url", "text")
            )
            if ff_path:
                os.makedirs(stage_dir, exist_ok=True)
                with open(ff_path, "w") as fd:
                    json.dump(form_freqs, fd)
            lineage.stage("truecase_dict", n_forms=len(form_freqs))

    # The annotated table feeds the aggregator AND (on the hmm/reuse
    # paths) the triple extraction; persist it so labelling runs once —
    # durably (stage parquet) when resumability is requested, else in
    # executor storage.
    annotated = annotate_pages(pages, form_freqs=form_freqs)
    mentions_resumed = False
    if stage_dir:
        annotated = _stage_materialize(spark, stage_dir, "annotated", annotated, lineage)
        mentions_resumed = os.path.exists(
            os.path.join(stage_dir, "mentions", "_SUCCESS")
        )
    else:
        annotated = annotated.persist()

    model = None
    if aggregator == "hmm" and not mentions_resumed:
        model = HMMAggregator(n_iter=hmm_iters)
        model.fit_spark(spark, annotated, checkpoint_dir=checkpoint_dir, resume=True)
        mentions = model.decode_spark(spark, annotated)
        lineage.stage("hmm_fit", annotated, iterations=len(model.history),
                      logprob=model.history[-1] if model.history else None)
    elif aggregator == "hmm":
        mentions = None  # read below from the committed stage
    else:
        mentions = majority_voter_mentions(annotated)
    if stage_dir:
        if mentions is None:  # hmm path resuming a committed stage
            mentions = spark.read.parquet(os.path.join(stage_dir, "mentions"))
            lineage.stage("stage_resume_mentions")
        else:
            mentions = _stage_materialize(spark, stage_dir, "mentions", mentions, lineage)
    else:
        mentions = mentions.persist()
    lineage.stage("aggregate", mentions)

    if (aggregator == "hmm" and model is not None and not stage_dir
            and not mentions_consumed):
        # decode-fused: Viterbi + SVO in one Arrow stage over the
        # persisted annotated table — no mentions join on the graph
        # path. Only when the decoded mentions are NOT also being
        # materialized: a caller exporting mentions would otherwise pay
        # the corpus Viterbi twice (once fused, once for the export).
        raw_triples = extract_triples_hmm_fused(
            annotated, model, correct=entity_correction
        )
    elif aggregator == "hmm" or stage_dir:
        # resumed (or stage-durable) runs extract from the committed
        # mention/annotated stages: one co-partitioned join, no re-fit
        raw_triples = extract_triples(annotated, mentions, correct=entity_correction)
    elif mentions_consumed or with_metrics:
        # annotated gets materialized anyway — reuse its cache so the
        # labelling stage executes exactly once end-to-end
        raw_triples = extract_triples_fused(annotated, correct=entity_correction)
    else:
        # graph-only caller: maximally-fused single python stage over
        # pages — span structs never cross Arrow on the graph path
        raw_triples = extract_triples_direct(
            pages, form_freqs=form_freqs, correct=entity_correction
        )
    if with_metrics:
        for row in stage_metrics(annotated).collect():
            lineage.stage("annotate_partition", **row.asDict())
    linked = link_entities(spark, raw_triples)
    canon_stats: dict = {}
    canonical = canonicalize_triples(
        spark, linked, stats=canon_stats if lineage_path else None
    )
    graph = materialize_graph(canonical)
    lineage.stage("graph", graph, **canon_stats)
    return annotated, mentions, graph


def all_source_mentions(pages: DataFrame) -> DataFrame:
    """The raw weak-supervision mention table (every labelling
    function's layer, exploded long form)."""
    return mentions_from_annotated(annotate_pages(pages))


def verify_text_identity(pages: DataFrame) -> int:
    """Count rows where html→text extraction does NOT reproduce the
    ``text`` column byte-identically (must be 0; input_hint invariant).
    Runs JVM-side: the html wrapper is deterministic."""
    from pyspark.sql import types as T
    import pandas as pd

    from weak_supervision_for_ner_spark.sources.pages import extract_text_from_html

    def check(batches):
        for pdf in batches:
            bad = sum(
                1 for html, text in zip(pdf["html"], pdf["text"])
                if extract_text_from_html(bytes(html)) != text
            )
            yield pd.DataFrame({"bad": [bad]})

    schema = T.StructType([T.StructField("bad", T.LongType())])
    rows = pages.select("html", "text").mapInPandas(check, schema=schema).collect()
    return int(sum(r["bad"] for r in rows))
