"""Label/source registries and Spark schemas.

Mirrors the reference's fixed schema system (labelling.py:7-81 in
/root/reference): 19 entity types, BILU-positioned state space, a
registry of labelling sources with per-source (precision, recall)
priors. Our source list contains only deterministic sources — the
reference's spaCy/crowd model sources (BTC, SEC, conll2003,
core_web_md, snips) are plug-in points we do not ship (SURVEY.md §7.4);
extract_sequence tolerates absent sources exactly like the reference
(labelling.py:152).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Label space (reference: labelling.py:7-12)
# ---------------------------------------------------------------------------

LABELS = [
    "CARDINAL", "COMPANY", "DATE", "EVENT", "FAC", "GPE", "LANGUAGE",
    "LAW", "LOC", "MONEY", "NORP", "ORDINAL", "ORG", "PERCENT",
    "PERSON", "PRODUCT", "QUANTITY", "TIME", "WORK_OF_ART",
]

POSITIONED_LABELS = ["O"] + [
    f"{bilu}-{label}" for label in LABELS for bilu in "BILU"
]

LABEL_INDICES = {label: i for i, label in enumerate(POSITIONED_LABELS)}

NUMBER_NERS = ["CARDINAL", "DATE", "MONEY", "ORDINAL", "PERCENT", "QUANTITY", "TIME"]

# Labels that are placeholders to be specialised away (labelling.py:156)
GENERIC_LABELS = {"ENT", "MISC"}

# ---------------------------------------------------------------------------
# Source registry (deterministic subset; reference: labelling.py:14-23)
# ---------------------------------------------------------------------------

GAZETTEERS = ["wiki", "geo", "crunchbase", "product"]

SOURCE_NAMES = sorted(
    [
        "date_detector", "time_detector", "money_detector", "number_detector",
        "proper_detector", "proper2_detector", "nnp_detector", "compound_detector",
        "infrequent_proper_detector", "infrequent_proper2_detector",
        "infrequent_nnp_detector", "infrequent_compound_detector",
        "company_type_detector", "full_name_detector",
        "misc_detector", "legal_detector",
        "doc_history", "doc_majority_cased", "doc_majority_uncased",
        # plug-in slot for external model annotators (the reference
        # registers spaCy models the same way, labelling.py:14-23);
        # static on purpose: executors re-import this module, so the
        # registry must ship with the package, not be mutated at runtime.
        # Every registered model contributes TWO layers like the
        # reference (annotations.py:531-535): the raw predictions and
        # the entity-corrected "+c" variant.
        "model_annotator", "model_annotator+c",
    ]
    + [f"{gaz}_{case}" for gaz in GAZETTEERS for case in ("cased", "uncased")]
    + [f"multitoken_{gaz}_{case}" for gaz in GAZETTEERS for case in ("cased", "uncased")]
)

SOURCE_INDICES = {s: i for i, s in enumerate(SOURCE_NAMES)}

# Per-source (precision, recall) priors seeding the HMM emission model.
# Values follow the reference's prior table (labelling.py:27-78) for the
# sources we share.
_NON_NUMBER = [l for l in LABELS if l not in NUMBER_NERS]

SOURCE_PRIORS: dict[str, dict[str, tuple[float, float]]] = {
    "company_type_detector": {"COMPANY": (0.9999, 0.4)},
    "compound_detector": {l: ((0.7, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "crunchbase_cased": {l: (0.7, 0.6) for l in ["PERSON", "ORG", "COMPANY"]},
    "crunchbase_uncased": {l: (0.6, 0.7) for l in ["PERSON", "ORG", "COMPANY"]},
    "date_detector": {"DATE": (0.9, 0.9)},
    "doc_history": {l: (0.99, 0.4) for l in ["PERSON", "COMPANY"]},
    "doc_majority_cased": {l: (0.98, 0.4) for l in LABELS},
    "doc_majority_uncased": {l: (0.95, 0.5) for l in LABELS},
    "full_name_detector": {"PERSON": (0.9999, 0.4)},
    "geo_cased": {l: (0.8, 0.8) for l in ["GPE", "LOC"]},
    "geo_uncased": {l: (0.8, 0.8) for l in ["GPE", "LOC"]},
    "infrequent_compound_detector": {l: ((0.7, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "infrequent_nnp_detector": {l: ((0.7, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "infrequent_proper2_detector": {l: ((0.7, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "infrequent_proper_detector": {l: ((0.7, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "legal_detector": {"LAW": (0.8, 0.8)},
    "misc_detector": {l: (0.7, 0.7) for l in ["NORP", "EVENT", "FAC", "GPE", "LANGUAGE"]},
    # neural-model prior mirroring the reference's core_web_md row;
    # the corrected "+c" layer carries the same prior (the reference
    # registers both under one prior family, labelling.py:27-78)
    "model_annotator": {l: ((0.8, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "model_annotator+c": {l: ((0.8, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "money_detector": {"MONEY": (0.9, 0.9)},
    "multitoken_crunchbase_cased": {l: (0.8, 0.6) for l in ["PERSON", "ORG", "COMPANY"]},
    "multitoken_crunchbase_uncased": {l: (0.7, 0.7) for l in ["PERSON", "ORG", "COMPANY"]},
    "multitoken_geo_cased": {l: (0.8, 0.6) for l in ["GPE", "LOC"]},
    "multitoken_geo_uncased": {l: (0.7, 0.7) for l in ["GPE", "LOC"]},
    "multitoken_product_cased": {"PRODUCT": (0.8, 0.6)},
    "multitoken_product_uncased": {"PRODUCT": (0.7, 0.7)},
    "multitoken_wiki_cased": {l: (0.8, 0.6) for l in ["PERSON", "GPE", "LOC", "ORG", "COMPANY", "PRODUCT"]},
    "multitoken_wiki_uncased": {l: (0.7, 0.7) for l in ["PERSON", "GPE", "LOC", "ORG", "COMPANY", "PRODUCT"]},
    "nnp_detector": {l: ((0.8, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "number_detector": {l: (0.9, 0.9) for l in ["CARDINAL", "ORDINAL", "QUANTITY", "PERCENT"]},
    "product_cased": {"PRODUCT": (0.7, 0.6)},
    "product_uncased": {"PRODUCT": (0.6, 0.7)},
    "proper2_detector": {l: ((0.6, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "proper_detector": {l: ((0.6, 0.8) if l not in NUMBER_NERS else (0.01, 0.01)) for l in LABELS},
    "time_detector": {"TIME": (0.9, 0.9)},
    "wiki_cased": {l: (0.6, 0.5) for l in ["PERSON", "GPE", "LOC", "ORG", "COMPANY", "PRODUCT"]},
    "wiki_uncased": {l: (0.5, 0.6) for l in ["PERSON", "GPE", "LOC", "ORG", "COMPANY", "PRODUCT"]},
}

assert set(SOURCE_PRIORS) == set(SOURCE_NAMES), (
    set(SOURCE_PRIORS) ^ set(SOURCE_NAMES)
)

# Emission-model constants for states/labels outside a source's prior
# coverage (reference: labelling.py:80-81).
OUT_RECALL = 0.9
OUT_PRECISION = 0.8

# CoNLL evaluation mapping (reference: analysis.py:6-8)
CONLL_TO_RETAIN = {"PER", "MISC", "ORG", "LOC"}
CONLL_MAPPINGS = {
    "PERSON": "PER", "COMPANY": "ORG", "GPE": "LOC", "EVENT": "MISC",
    "FAC": "MISC", "LANGUAGE": "MISC", "LAW": "MISC", "NORP": "MISC",
    "PRODUCT": "MISC", "WORK_OF_ART": "MISC",
}

# ---------------------------------------------------------------------------
# Spark schemas
# ---------------------------------------------------------------------------

# Input table (BASELINE.json input_hint)
PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])

SPAN_SCHEMA = T.StructType([
    T.StructField("source", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("label", T.StringType(), False),
    T.StructField("conf", T.DoubleType(), False),
])

# Output of the annotation stage: one row per page, tokens + all layers.
ANNOTATED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.StringType()), False),
    T.StructField("spans", T.ArrayType(SPAN_SCHEMA), False),
])

# Long/exploded relational form of annotation layers.
MENTIONS_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("source", T.StringType(), False),
    T.StructField("start", T.IntegerType(), False),
    T.StructField("end", T.IntegerType(), False),
    T.StructField("label", T.StringType(), False),
    T.StructField("conf", T.DoubleType(), False),
    T.StructField("text", T.StringType(), True),
])

# KG output table (north_rule)
TRIPLES_SCHEMA = T.StructType([
    T.StructField("subj", T.StringType(), False),
    T.StructField("subj_type", T.StringType(), False),
    T.StructField("pred", T.StringType(), False),
    T.StructField("obj", T.StringType(), False),
    T.StructField("obj_type", T.StringType(), False),
    T.StructField("url", T.StringType(), False),
    T.StructField("conf", T.DoubleType(), False),
])
