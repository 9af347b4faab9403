"""sources_to_keep (UnifiedAnnotator, labelling.py:93-100): every
aggregator can train/decode on a source subset. For the HMM the mask
must be EXACT: excluded sources are pinned to deterministic O-emitters,
so a fit on the full annotated table equals a fit where the excluded
sources' spans were physically removed from the input."""

import numpy as np
import pytest

from weak_supervision_for_ner_spark.schema import SOURCE_NAMES

GAZ_SOURCES = [s for s in SOURCE_NAMES if "wiki" in s or "geo" in s
               or "crunchbase" in s or "product" in s]
KEEP = [s for s in SOURCE_NAMES if s not in GAZ_SOURCES]

# For the exact mask==removal equivalence we must exclude sources that
# do NOT feed specialisation evidence (removing evidence sources
# changes OTHER layers' specialised ENT distributions, which the mask —
# correctly, per reference order: specialise over everything, THEN
# subset — preserves).
DETECTORS = [s for s in SOURCE_NAMES
             if "proper" in s or "nnp_" in s or "compound" in s]
KEEP_NON_DETECTOR = [s for s in SOURCE_NAMES if s not in DETECTORS]


@pytest.fixture(scope="module")
def annotated(spark):
    from weak_supervision_for_ner_spark.operators.annotate import annotate_pages
    from weak_supervision_for_ner_spark.sources.pages import synth_pages

    return annotate_pages(synth_pages(spark, 60, partitions=3)).persist()


def _strip_sources(spark, annotated, excluded: set):
    import pandas as pd

    from weak_supervision_for_ner_spark.schema import ANNOTATED_SCHEMA

    def run(batches):
        for pdf in batches:
            spans_out = []
            for spans in pdf["spans"]:
                spans_out.append([m for m in spans if m["source"] not in excluded])
            yield pd.DataFrame(
                {"url": pdf["url"], "tokens": pdf["tokens"], "spans": spans_out}
            )

    return annotated.mapInPandas(run, schema=ANNOTATED_SCHEMA)


def test_hmm_source_mask_equals_physical_removal(spark, annotated):
    from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator

    masked = HMMAggregator(n_iter=2, sources_to_keep=KEEP_NON_DETECTOR)
    masked.fit_spark(spark, annotated)

    stripped = _strip_sources(spark, annotated, set(DETECTORS)).persist()
    removed = HMMAggregator(n_iter=2, sources_to_keep=KEEP_NON_DETECTOR)
    removed.fit_spark(spark, stripped)

    assert len(masked.history) == len(removed.history)
    for a, b in zip(masked.history, removed.history):
        assert a == pytest.approx(b, rel=1e-9)
    assert np.allclose(masked.emission_probs, removed.emission_probs)
    # excluded sources stay exact O-emitters through EM
    for si in masked._excluded:
        assert np.allclose(masked.emission_probs[si, :, 0], 1.0)
        assert np.allclose(masked.emission_probs[si, :, 1:], 0.0)

    got = {(r["url"], r["start"], r["end"], r["label"])
           for r in masked.decode_spark(spark, annotated).collect()}
    want = {(r["url"], r["start"], r["end"], r["label"])
            for r in removed.decode_spark(spark, stripped).collect()}
    assert got == want
    stripped.unpersist()


def test_hmm_unknown_source_rejected():
    from weak_supervision_for_ner_spark.operators.hmm import HMMAggregator

    with pytest.raises(ValueError):
        HMMAggregator(sources_to_keep=["no_such_source"])


def test_majority_voter_source_subset(spark, annotated):
    from weak_supervision_for_ner_spark.operators.aggregate import majority_voter_mentions

    full = majority_voter_mentions(annotated).collect()
    subset = majority_voter_mentions(annotated, sources_to_keep=KEEP).collect()
    assert len(subset) != len(full)  # dropping all gazetteers changes the vote
    # gazetteer-only labels (e.g. exact GPE names) lose support
    assert len(subset) < len(full)


def test_labelmodel_source_subset(spark, annotated):
    from weak_supervision_for_ner_spark.operators.labelmodel import LabelModelAggregator

    model = LabelModelAggregator(n_iter=3, sources_to_keep=KEEP)
    model.fit_spark(spark, annotated)
    rows = model.decode_spark(spark, annotated).collect()
    assert rows  # still decodes from the detector votes alone
    full = LabelModelAggregator(n_iter=3)
    full.fit_spark(spark, annotated)
    assert model.history[-1] != full.history[-1]
