"""End-to-end KG quality gate: pipeline triples vs the generator's
seeded gold relations (north_rule: P/R >= 0.95)."""

from pyspark.sql import functions as F

from weak_supervision_for_ner_spark.functions.lexicons import LEGAL_SUFFIXES
from weak_supervision_for_ner_spark.plans.pipeline import run_kg_pipeline
from weak_supervision_for_ner_spark.sources.pages import synth_gold_triples, synth_pages

_SUFFIX_RE = r"(?i)\s+(" + "|".join(sorted(LEGAL_SUFFIXES)) + r")\.?$"


def _norm(col):
    # strip up to two trailing legal suffixes ("Umbrella Corp Inc.")
    return F.regexp_replace(F.regexp_replace(F.lower(col), _SUFFIX_RE, ""), _SUFFIX_RE, "")


def test_kg_triples_match_generator_gold(spark):
    n = 300
    pages = synth_pages(spark, n).persist()
    _, _, graph = run_kg_pipeline(spark, pages)
    got = graph.select(
        _norm("subj").alias("subj"), "pred", _norm("obj").alias("obj"), "url"
    ).distinct()
    gold = synth_gold_triples(spark, n).select(
        _norm("subj").alias("subj"), "pred", _norm("obj").alias("obj"), "url"
    ).distinct()
    tp = got.join(gold, ["url", "subj", "pred", "obj"]).count()
    n_got, n_gold = got.count(), gold.count()
    assert n_gold > 100
    precision = tp / max(n_got, 1)
    recall = tp / max(n_gold, 1)
    assert precision >= 0.95, (precision, n_got, tp)
    assert recall >= 0.95, (recall, n_gold, tp)


def test_graph_matches_single_node_oracle_exactly(spark):
    """The distributed graph equals the full single-node oracle —
    including the minhash-LSH canonicalization reproduced via the
    bit-exact xxhash64 mirror. This is the parity the
    oracle_triples_sf0.01 fixture gate certifies at the driver."""
    from weak_supervision_for_ner_spark.plans.oracle import oracle_graph
    from weak_supervision_for_ner_spark.sources.pages import make_page

    n = 150
    _, _, graph = run_kg_pipeline(spark, synth_pages(spark, n), aggregator="majority")
    cols = ["subj", "subj_type", "pred", "obj", "obj_type", "url", "conf",
            "subj_id", "obj_id"]
    spark_rows = sorted(tuple(r[c] for c in cols) for r in graph.collect())
    oracle_rows = sorted(oracle_graph([make_page(i, 42)[0] for i in range(n)]))
    assert len(spark_rows) > 50
    assert spark_rows == oracle_rows
