"""Distributed-correctness tests: Spark output == single-node oracle,
invariance across partition counts, byte-identical text extraction,
triple P/R vs oracle (north_rule gates)."""

import pytest

from weak_supervision_for_ner_spark.operators.aggregate import majority_voter_mentions
from weak_supervision_for_ner_spark.operators.annotate import (
    annotate_pages,
    mentions_from_annotated,
)
from weak_supervision_for_ner_spark.plans.oracle import (
    oracle_annotate,
    oracle_majority_mentions,
    oracle_triples,
)
from weak_supervision_for_ner_spark.plans.pipeline import (
    run_kg_pipeline,
    verify_text_identity,
)
from weak_supervision_for_ner_spark.sources.pages import make_page, synth_pages

N_DOCS = 120


@pytest.fixture(scope="module")
def pages_df(spark):
    return synth_pages(spark, N_DOCS, partitions=4).persist()


@pytest.fixture(scope="module")
def oracle_docs():
    return oracle_annotate([make_page(i)[0] for i in range(N_DOCS)])


def _mention_set(rows):
    return {(r[0], r[1], int(r[2]), int(r[3]), r[4], round(float(r[5]), 6)) for r in rows}


def test_spark_annotate_matches_oracle(spark, pages_df, oracle_docs):
    spark_mentions = mentions_from_annotated(annotate_pages(pages_df)).collect()
    got = _mention_set(
        (r["url"], r["source"], r["start"], r["end"], r["label"], r["conf"])
        for r in spark_mentions
    )
    want = _mention_set(
        (d["url"], src, s, e, lab, conf)
        for d in oracle_docs
        for (src, s, e, lab, conf) in d["spans"]
    )
    assert got == want


def test_partition_count_invariance(spark):
    a = mentions_from_annotated(annotate_pages(synth_pages(spark, 60, partitions=1))).collect()
    b = mentions_from_annotated(annotate_pages(synth_pages(spark, 60, partitions=7))).collect()
    key = lambda r: (r["url"], r["source"], r["start"], r["end"], r["label"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_majority_voter_matches_oracle(spark, pages_df, oracle_docs):
    got = _mention_set(
        (r["url"], r["source"], r["start"], r["end"], r["label"], r["conf"])
        for r in majority_voter_mentions(annotate_pages(pages_df)).collect()
    )
    want = _mention_set(oracle_majority_mentions(oracle_docs))
    assert got == want


def test_text_extraction_byte_identical(spark, pages_df):
    assert verify_text_identity(pages_df) == 0


def test_kg_pipeline_triples_pr_vs_oracle(spark, pages_df, oracle_docs):
    _, _, graph = run_kg_pipeline(spark, pages_df, aggregator="majority")
    got = {
        (r["subj"], r["pred"], r["obj"], r["url"])
        for r in graph.select("subj", "pred", "obj", "url").collect()
    }
    oracle_ments = oracle_majority_mentions(oracle_docs)
    want = {(t[0], t[2], t[3], t[5]) for t in oracle_triples(oracle_docs, oracle_ments)}
    assert want, "oracle should produce triples on the synthetic corpus"
    tp = len(got & want)
    precision = tp / max(len(got), 1)
    recall = tp / max(len(want), 1)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall, len(got), len(want))


def test_graph_has_linked_and_canonical_ids(spark, pages_df):
    _, _, graph = run_kg_pipeline(spark, pages_df, aggregator="majority")
    rows = graph.collect()
    assert rows
    assert all(r["subj_id"] and r["obj_id"] for r in rows)
    assert any(r["subj_id"].startswith("kb:") for r in rows), "entity linking should hit the KB"


def test_hmm_spark_fit_and_decode(spark, tmp_path):
    from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator
    from weak_supervision_for_ner_spark.plans.oracle import (
        oracle_hmm_fit,
        oracle_hmm_mentions,
    )

    pages = synth_pages(spark, 60, partitions=3)
    annotated = annotate_pages(pages).persist()
    model = HMMAggregator(n_iter=2)
    model.fit_spark(spark, annotated, checkpoint_dir=str(tmp_path / "ckpt"))

    oracle_docs = oracle_annotate([make_page(i)[0] for i in range(60)])
    oracle_model = oracle_hmm_fit(oracle_docs, n_iter=2)

    # identical seeded init + identical corpus stats => identical history
    assert len(model.history) == len(oracle_model.history)
    for a, b in zip(model.history, oracle_model.history):
        assert a == pytest.approx(b, rel=1e-9)

    got = _mention_set(
        (r["url"], r["source"], r["start"], r["end"], r["label"], r["conf"])
        for r in model.decode_spark(spark, annotated).collect()
    )
    want = _mention_set(oracle_hmm_mentions(oracle_model, oracle_docs))
    assert got == want

    # resume from checkpoint: skips completed iterations, same params
    model2 = HMMAggregator(n_iter=2)
    model2.fit_spark(spark, annotated, checkpoint_dir=str(tmp_path / "ckpt"), resume=True)
    import numpy as np

    assert np.allclose(model2.emission_probs, model.emission_probs)


def test_hmm_tree_combine_matches_flat_collect(spark):
    """E-step stats AND the one-time prior-count pass summed through
    the tree-combine level at 256 partitions must reproduce the
    flat-collect fit (same prior matrices, same logprob history up to
    float summation order, same parameters)."""
    import numpy as np

    from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator

    pages = synth_pages(spark, 60, partitions=3)
    annotated = annotate_pages(pages).persist()

    flat = HMMAggregator(n_iter=2)
    flat.fit_spark(spark, annotated, tree_combine=False)

    wide = HMMAggregator(n_iter=2)
    wide.fit_spark(spark, annotated.repartition(256), tree_combine=True, combine_fanin=16)

    # prior-count pass parity (flat driver sum vs tree-combined)
    assert np.allclose(flat.startprob_prior, wide.startprob_prior)
    assert np.allclose(flat.transmat_prior, wide.transmat_prior)
    assert np.allclose(flat.emission_priors, wide.emission_priors)
    assert len(flat.history) == len(wide.history)
    for a, b in zip(flat.history, wide.history):
        assert a == pytest.approx(b, rel=1e-9)
    assert np.allclose(flat.emission_probs, wide.emission_probs)
    assert np.allclose(flat.transmat_, wide.transmat_)
    annotated.unpersist()


def test_pipeline_fused_reuse_matches_direct(spark, tmp_path):
    """mentions_consumed=True routes triple extraction through the
    persisted annotated cache (labelling once end-to-end) and must
    produce the identical graph; lineage records LSH-drop and
    CC-convergence counters so truncation is never silent."""
    import json

    pages = synth_pages(spark, 80, partitions=3).persist()
    _, _, g_direct = run_kg_pipeline(spark, pages, aggregator="majority")
    lineage_path = str(tmp_path / "lineage.json")
    _, _, g_fused = run_kg_pipeline(
        spark, pages, aggregator="majority",
        mentions_consumed=True, lineage_path=lineage_path,
    )
    cols = g_direct.columns
    direct = sorted(map(tuple, g_direct.select(*cols).collect()))
    fused = sorted(map(tuple, g_fused.select(*cols).collect()))
    assert direct == fused

    with open(lineage_path) as fd:
        records = {r["stage"]: r for r in json.load(fd)}
    graph_rec = records["graph"]
    assert "dropped_buckets" in graph_rec and "unconverged_labels" in graph_rec
    assert graph_rec["unconverged_labels"] == 0


def test_cli_job_writes_graph_and_json_mentions(spark, tmp_path, monkeypatch):
    """The spark-submit entry point end-to-end in-process: graph
    parquet + mentions parquet + the convert_to_json sink."""
    import sys

    from jobs.run_pipeline import main

    out = tmp_path / "graph"
    ments = tmp_path / "mentions"
    mjson = tmp_path / "mentions_json"
    monkeypatch.setattr(sys, "argv", [
        "run_pipeline.py", "--input", "synth:40", "--output", str(out),
        "--mentions-out", str(ments), "--mentions-json", str(mjson),
        "--lineage", str(tmp_path / "lineage.json"),
    ])
    main()
    assert spark.read.parquet(str(out)).count() > 0
    assert spark.read.parquet(str(ments)).count() > 0
    json_rows = spark.read.json(str(mjson))
    assert json_rows.count() > 0
    assert {"url", "source", "start", "end", "label", "conf"} <= set(json_rows.columns)


def test_hmm_fused_triples_match_join_path(spark):
    """extract_triples_hmm_fused (decode + SVO in one Arrow stage, no
    mentions join) must produce the identical triple set as decoding to
    a mentions table and joining it back."""
    from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator
    from weak_supervision_for_ner_spark.operators.triples import (
        extract_triples,
        extract_triples_hmm_fused,
    )

    pages = synth_pages(spark, 80, partitions=3)
    annotated = annotate_pages(pages).persist()
    model = HMMAggregator(n_iter=2)
    model.fit_spark(spark, annotated)

    joined = extract_triples(annotated, model.decode_spark(spark, annotated))
    fused = extract_triples_hmm_fused(annotated, model)
    cols = sorted(fused.columns)
    a = sorted(map(tuple, joined.select(*cols).collect()))
    b = sorted(map(tuple, fused.select(*cols).collect()))
    assert a == b and a
    # and the fused plan really has no join
    assert "Join" not in fused._jdf.queryExecution().executedPlan().toString()
    annotated.unpersist()


def test_cli_truecase_and_correction_are_flagship_defaults(spark, tmp_path, monkeypatch):
    """The reference truecases <=25-token docs during parsing and
    repairs entities after every annotation BY DEFAULT — so must the
    CLI: an ALL-CAPS headline page yields its triple through the stock
    CLI invocation, and --no-truecase loses it."""
    import sys

    from jobs.run_pipeline import main

    pages = synth_pages(spark, 60, partitions=2).select("url", "text", "lang")
    extra = spark.createDataFrame(
        [("https://caps.example.com/h1",
          "REPORT : CYBERDYNE SYSTEMS ACQUIRED INITECH", "en")],
        "url string, text string, lang string",
    )
    inp = tmp_path / "pages"
    pages.unionByName(extra).write.parquet(str(inp))

    def run(*flags):
        out = tmp_path / ("graph" + str(len(flags)))
        monkeypatch.setattr(sys, "argv", [
            "run_pipeline.py", "--input", str(inp), "--output", str(out), *flags,
        ])
        main()
        return spark.read.parquet(str(out))

    stock = run()
    hit = stock.filter("url = 'https://caps.example.com/h1'").collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in hit] == [
        ("Cyberdyne Systems", "acquired", "Initech")
    ]
    no_tc = run("--no-truecase")
    assert no_tc.filter("url = 'https://caps.example.com/h1'").count() == 0


def test_canonicalize_driver_and_distributed_paths_agree(spark, pages_df):
    """The driver-side union-find strategy (small unlinked sets) and
    the distributed LSH+CC path must assign identical canonical ids."""
    from weak_supervision_for_ner_spark.operators.triples import (
        canonicalize_triples,
        extract_triples_direct,
        link_entities,
        materialize_graph,
    )

    linked = link_entities(spark, extract_triples_direct(pages_df)).persist()
    local = materialize_graph(canonicalize_triples(spark, linked))
    dist = materialize_graph(canonicalize_triples(spark, linked, driver_threshold=0))
    cols = sorted(local.columns)
    a = sorted(map(tuple, local.select(*cols).collect()))
    b = sorted(map(tuple, dist.select(*cols).collect()))
    assert a == b and a
    linked.unpersist()


def test_salted_mentions_write_balances_hot_domain(spark, tmp_path):
    """SURVEY §4 hot-domain skew: 95% of mentions from ONE domain must
    still spread evenly across the sink's buckets because the salt is
    the full-url hash, not the domain. Balanced = every output file
    within 3x the mean row count (a domain-partitioned write would put
    95% in one file)."""
    from pyspark.sql import functions as F

    from weak_supervision_for_ner_spark.operators.annotate import write_mentions

    hot = spark.range(1900).selectExpr(
        "concat('https://hot.example.com/page/', id) AS url",
        "'src' AS source", "0 AS start", "1 AS end",
        "'ORG' AS label", "1.0 AS conf", "'x' AS text",
    )
    cold = spark.range(100).selectExpr(
        "concat('https://site', id, '.example.net/p') AS url",
        "'src' AS source", "0 AS start", "1 AS end",
        "'ORG' AS label", "1.0 AS conf", "'x' AS text",
    )
    out = str(tmp_path / "mentions_skew")
    write_mentions(hot.unionAll(cold), out, buckets=8)

    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    counts = [r["count"] for r in per_file]
    assert len(counts) == 8
    assert max(counts) <= 3 * (sum(counts) / len(counts))


def test_stage_dir_resumes_mid_pipeline(spark, tmp_path):
    """Durable mid-pipeline resume (north_rule): with stage_dir set,
    committed annotated/mentions stages are REUSED by a re-run — proven
    by swapping the input for a garbage corpus and still getting the
    byte-identical graph — and the stage-durable run's graph equals the
    plain in-memory run's."""
    import json

    pages = synth_pages(spark, 80, partitions=3).persist()
    stage = str(tmp_path / "stages")
    lineage1 = str(tmp_path / "l1.json")
    _, _, g_plain = run_kg_pipeline(spark, pages, aggregator="majority")
    _, _, g_staged = run_kg_pipeline(
        spark, pages, aggregator="majority",
        stage_dir=stage, lineage_path=lineage1,
    )
    cols = sorted(g_plain.columns)
    plain = sorted(map(tuple, g_plain.select(*cols).collect()))
    staged = sorted(map(tuple, g_staged.select(*cols).collect()))
    assert staged == plain and staged
    with open(lineage1) as fd:
        stages1 = [r["stage"] for r in json.load(fd)]
    assert "stage_commit_annotated" in stages1
    assert "stage_commit_mentions" in stages1

    # re-run over the same input: committed stages are READ, not
    # recomputed (lineage proves it), and the graph is byte-identical
    lineage2 = str(tmp_path / "l2.json")
    _, _, g_resumed = run_kg_pipeline(
        spark, pages, aggregator="majority",
        stage_dir=stage, lineage_path=lineage2,
    )
    resumed = sorted(map(tuple, g_resumed.select(*cols).collect()))
    assert resumed == plain
    with open(lineage2) as fd:
        stages2 = [r["stage"] for r in json.load(fd)]
    assert "stage_resume_annotated" in stages2
    assert "stage_resume_mentions" in stages2
    assert "truecase_dict_resumed" in stages2

    # a DIFFERENT corpus against the same stage_dir must be rejected —
    # the input identity is part of the fingerprint; silently serving
    # the old corpus's stages would be stale-reuse under a new name
    garbage = synth_pages(spark, 5, partitions=1).selectExpr(
        "url", "warc_ts", "html", "'nothing here' AS text", "lang"
    )
    with pytest.raises(ValueError, match="stage_dir"):
        run_kg_pipeline(spark, garbage, aggregator="majority", stage_dir=stage)


def test_stage_dir_rejects_config_mismatch(spark, tmp_path):
    """A stage_dir committed under one configuration must refuse to
    resume under another (silent stale-stage reuse would return the old
    config's results under the new run's name)."""
    pages = synth_pages(spark, 30, partitions=2)
    stage = str(tmp_path / "stages_cfg")
    _, _, g = run_kg_pipeline(spark, pages, aggregator="majority", stage_dir=stage)
    g.count()
    with pytest.raises(ValueError, match="stage_dir"):
        run_kg_pipeline(spark, pages, aggregator="hmm", stage_dir=stage)
    with pytest.raises(ValueError, match="stage_dir"):
        run_kg_pipeline(spark, pages, truecase=False, stage_dir=stage)


def test_stale_registry_checkpoint_triggers_retrain(spark, tmp_path):
    """A checkpoint written under an older SOURCE_NAMES registry (wrong
    emission-tensor shape) must be skipped with a warning and the model
    retrained — not crash with an IndexError mid-fit."""
    import numpy as np

    from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator

    annotated = annotate_pages(synth_pages(spark, 30, partitions=2)).persist()
    ckpt = str(tmp_path / "ckpt_stale")
    model = HMMAggregator(n_iter=1)
    model.fit_spark(spark, annotated, checkpoint_dir=ckpt)

    # corrupt the latest checkpoint into an "old registry" shape
    # (iter_0*: lexicographic iter_*.npz would pick iter_init.npz,
    # which resume never reads — corrupting it tests nothing)
    import glob
    latest = sorted(glob.glob(ckpt + "/iter_0*.npz"))[-1]
    data = dict(np.load(latest))
    data["emission_probs"] = data["emission_probs"][:-1]   # one source fewer
    np.savez(latest[:-4], **data)

    resumed = HMMAggregator(n_iter=1)
    resumed.fit_spark(spark, annotated, checkpoint_dir=str(tmp_path / "other"),
                      resume=False)  # sanity: fresh fit still works
    retrained = HMMAggregator(n_iter=1)
    retrained.fit_spark(spark, annotated, checkpoint_dir=ckpt, resume=True)
    # the stale checkpoint was ignored: a full iteration ran fresh
    assert len(retrained.history) == 1
    assert retrained.emission_probs.shape == model.emission_probs.shape

    # the incompatible file was quarantined (renamed .stale), so a THIRD
    # resume picks the retrain's own valid checkpoint instead of
    # re-selecting the stale max-iteration file forever
    import glob as _glob
    assert _glob.glob(ckpt + "/iter_*.npz.stale")
    resumed2 = HMMAggregator(n_iter=1)
    resumed2.fit_spark(spark, annotated, checkpoint_dir=ckpt, resume=True)
    # resume succeeded from the retrain's checkpoint: no fresh iteration
    # was needed (start_iter = latest+1 >= n_iter -> empty loop)
    assert resumed2.emission_probs.shape == model.emission_probs.shape
    assert len(resumed2.history) == len(retrained.history)
    annotated.unpersist()


def test_cli_stage_dir_flag(spark, tmp_path, monkeypatch):
    """--stage-dir through the spark-submit entry point: first run
    commits stages, second run resumes them (lineage proves it)."""
    import json
    import sys

    from jobs.run_pipeline import main

    stage = str(tmp_path / "cli_stages")

    def run(n):
        lineage = str(tmp_path / f"cli_l{n}.json")
        monkeypatch.setattr(sys, "argv", [
            "run_pipeline.py", "--input", "synth:30",
            "--output", str(tmp_path / f"cli_graph{n}"),
            "--stage-dir", stage, "--lineage", lineage,
        ])
        main()
        with open(lineage) as fd:
            return [r["stage"] for r in json.load(fd)]

    first = run(1)
    second = run(2)
    assert "stage_commit_annotated" in first
    assert "stage_resume_annotated" in second and "stage_resume_mentions" in second
    a = spark.read.parquet(str(tmp_path / "cli_graph1")).count()
    b = spark.read.parquet(str(tmp_path / "cli_graph2")).count()
    assert a == b > 0


def test_stage_dir_rejects_same_size_different_corpus(spark, tmp_path):
    """The in-memory input fingerprint must be a content hash, not a
    bare row count: two same-size corpora with different text would
    otherwise collide and silently resume each other's stages."""
    pages = synth_pages(spark, 30, partitions=2)
    stage = str(tmp_path / "stages_same_size")
    run_kg_pipeline(spark, pages, aggregator="majority", stage_dir=stage)

    same_size_garbage = synth_pages(spark, 30, partitions=2).selectExpr(
        "url", "warc_ts", "html", "'nothing here' AS text", "lang"
    )
    with pytest.raises(ValueError, match="stage_dir"):
        run_kg_pipeline(spark, same_size_garbage, aggregator="majority",
                        stage_dir=stage)
