"""Model-annotator plug-in seam (annotations.py:478-542): a fake
"model" source flows annotate -> model -> specialise -> HMM, proving
extract_sequence and the aggregators handle dynamically-added sources
registered in schema.SOURCE_NAMES."""

import pytest


@pytest.fixture(scope="module")
def with_model(spark):
    from weak_supervision_for_ner_spark.operators.annotate import annotate_pages
    from weak_supervision_for_ner_spark.operators.model_annotator import (
        annotate_with_model,
        fake_gpe_model,
    )
    from weak_supervision_for_ner_spark.sources.pages import synth_pages

    annotated = annotate_pages(synth_pages(spark, 60, partitions=3))
    return annotate_with_model(annotated, fake_gpe_model()).persist()


def test_model_source_lands_in_mentions(spark, with_model):
    from weak_supervision_for_ner_spark.operators.annotate import mentions_from_annotated

    mentions = mentions_from_annotated(with_model)
    model_rows = mentions.filter("source = 'model_annotator'").collect()
    assert model_rows, "fake model produced no spans"
    assert all(r["label"] == "GPE" and r["conf"] == 0.85 for r in model_rows)
    assert any(r["text"] == "Oslo" for r in model_rows)


def test_unregistered_source_is_rejected(spark, with_model):
    from weak_supervision_for_ner_spark.operators.model_annotator import (
        annotate_with_model,
        fake_gpe_model,
    )

    with pytest.raises(ValueError):
        annotate_with_model(with_model, fake_gpe_model(), source_name="not_registered")


def test_model_source_feeds_extract_sequence_and_hmm(spark, with_model):
    from weak_supervision_for_ner_spark.operators.aggregate import sequence_from_spans
    from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator
    from weak_supervision_for_ner_spark.schema import LABEL_INDICES, SOURCE_INDICES

    rows = with_model.collect()
    gpe_u = LABEL_INDICES["U-GPE"]
    # BOTH layers of the registered model (raw + entity-corrected "+c",
    # reference annotations.py:531-535) must reach the observation tensor
    for src in ("model_annotator", "model_annotator+c"):
        si = SOURCE_INDICES[src]
        saw_vote = False
        for r in rows:
            X = sequence_from_spans(list(r["spans"]), len(r["tokens"]))
            if (X[:, si, gpe_u] > 0).any():
                saw_vote = True
                break
        assert saw_vote, f"{src} votes never reached the observation tensor"

    model = HMMAggregator(n_iter=2)
    model.fit_spark(spark, with_model)
    decoded = model.decode_spark(spark, with_model)
    assert decoded.filter("label = 'GPE'").count() > 0


def test_corrected_layer_repairs_model_spans(spark):
    """A model whose raw span stops before a legal suffix gets a "+c"
    layer extending it to ORG (rule: legal suffix right after -> ORG),
    while the raw layer stays untouched."""
    from weak_supervision_for_ner_spark.operators.annotate import (
        mentions_from_annotated,
    )
    from weak_supervision_for_ner_spark.operators.model_annotator import (
        annotate_with_model,
    )

    annotated = spark.createDataFrame(
        [("u1", ["Pied", "Piper", "GmbH", "expanded", "."], [])],
        "url string, tokens array<string>, "
        "spans array<struct<source:string,start:int,end:int,label:string,conf:double>>",
    )

    def stub_model(tokens):
        return [(0, 2, "COMPANY", 0.9)] if tokens[:2] == ["Pied", "Piper"] else []

    out = mentions_from_annotated(annotate_with_model(annotated, stub_model))
    raw = [(r["start"], r["end"], r["label"])
           for r in out.filter("source = 'model_annotator'").collect()]
    cor = [(r["start"], r["end"], r["label"])
           for r in out.filter("source = 'model_annotator+c'").collect()]
    assert raw == [(0, 2, "COMPANY")]
    assert cor == [(0, 3, "ORG")]


def test_generator_model_fn_still_emits_corrected_layer(spark):
    """A model_fn returning a GENERATOR (lazy tagger) is consumed twice
    (raw layer + corrected layer); the operator must materialize it
    once, or the second pass reads an exhausted iterator and the '+c'
    layer comes out silently empty."""
    from weak_supervision_for_ner_spark.operators.annotate import (
        annotate_pages,
        mentions_from_annotated,
    )
    from weak_supervision_for_ner_spark.operators.model_annotator import (
        annotate_with_model,
        fake_gpe_model,
    )
    from weak_supervision_for_ner_spark.sources.pages import synth_pages

    eager = fake_gpe_model()

    def lazy_model(tokens):
        return iter(eager(tokens))

    annotated = annotate_pages(synth_pages(spark, 60, partitions=3))
    mentions = mentions_from_annotated(annotate_with_model(annotated, lazy_model))
    by_source = {
        r["source"]: r["n"]
        for r in mentions.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    assert by_source.get("model_annotator", 0) > 0
    assert by_source.get("model_annotator+c", 0) > 0
