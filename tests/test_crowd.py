"""Crowd-gold loader (reference analysis.py:213-301): join external
annotations by exact sentence text, char->token re-alignment with
misaligned-span drops, DATETIME mapping, overlap merge, duplicate-
sentence dedup — and composition with the evaluation harness."""

import pytest


DOC_A = "Acme Corp acquired Initech . John Smith visited Oslo ."
DOC_B = "Unrelated opener . John Smith visited Oslo ."
# DOC_A tokens: Acme(0) Corp(5) acquired(10) Initech(19) .(27)
#               John(30) Smith(35) visited(41) Oslo(49) .(54)


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(
        [("https://a.example.com/1", DOC_A, "en"),
         ("https://b.example.com/2", DOC_B, "en")],
        "url string, text string, lang string",
    )


def crowd_df(spark, rows):
    return spark.createDataFrame(rows, "original_text string, annotated_text string")


def load(spark, pages, rows):
    from weak_supervision_for_ner_spark.sources.crowd import load_crowd_gold

    got = load_crowd_gold(crowd_df(spark, rows), pages).collect()
    return sorted((r["url"], r["start"], r["end"], r["label"]) for r in got)


def test_sentence_table_exact_substrings(spark, pages):
    from weak_supervision_for_ner_spark.sources.crowd import sentence_table

    sents = {(r["url"], r["sent_idx"]): (r["sent_start"], r["sent_text"])
             for r in sentence_table(pages).collect()}
    assert sents[("https://a.example.com/1", 0)] == (0, "Acme Corp acquired Initech .")
    assert sents[("https://a.example.com/1", 1)] == (5, "John Smith visited Oslo .")
    assert sents[("https://b.example.com/2", 1)] == (3, "John Smith visited Oslo .")


def test_crowd_gold_alignment_and_label_mapping(spark, pages):
    got = load(spark, pages, [
        # "Acme Corp" = chars 0..8 inclusive, "Initech" = 19..25
        ("Acme Corp acquired Initech .", "0-8/company 19-25/org"),
        # DATETIME maps to DATE; "Oslo" chars 19..22 within its sentence
        ("John Smith visited Oslo .", "19-22/datetime"),
    ])
    assert got == [
        ("https://a.example.com/1", 0, 2, "COMPANY"),
        ("https://a.example.com/1", 3, 4, "ORG"),
        # doc-level token coordinates: sentence starts at token 5
        ("https://a.example.com/1", 8, 9, "DATE"),
    ]


def test_misaligned_and_unmatched_spans_dropped(spark, pages):
    got = load(spark, pages, [
        # char 1 is inside token "Acme": no token boundary -> dropped,
        # while the aligned second span survives
        ("Acme Corp acquired Initech .", "1-8/person 19-25/org"),
        # sentence text matching nothing in the corpus -> no rows
        ("This sentence is not in the corpus .", "0-3/org"),
    ])
    assert got == [("https://a.example.com/1", 3, 4, "ORG")]


def test_overlap_merge_extends_later_span(spark, pages):
    # (0,2,COMPANY) then (1,3,PERSON) overlap -> the reference drops the
    # earlier span and extends the later one back to its start
    got = load(spark, pages, [
        ("Acme Corp acquired Initech .", "0-8/company 5-17/person"),
    ])
    assert got == [("https://a.example.com/1", 0, 3, "PERSON")]


def test_duplicate_sentences_dedup_to_first_occurrence(spark, pages):
    got = load(spark, pages, [
        ("John Smith visited Oslo .", "0-9/person"),
    ])
    # the sentence exists in BOTH docs; gold lands once, on (url, idx)-min
    assert got == [("https://a.example.com/1", 5, 7, "PERSON")]


def test_crowd_gold_composes_with_evaluate_mentions(spark, pages):
    from weak_supervision_for_ner_spark.operators.evaluate import evaluate_mentions
    from weak_supervision_for_ner_spark.sources.crowd import load_crowd_gold

    gold = load_crowd_gold(
        crowd_df(spark, [("Acme Corp acquired Initech .", "0-8/company 19-25/org")]),
        pages,
    )
    pred = spark.createDataFrame(
        [("https://a.example.com/1", 0, 2, "COMPANY", 0.9),   # TP
         ("https://a.example.com/1", 3, 4, "GPE", 0.9)],      # wrong label
        "url string, start int, end int, label string, conf double",
    )
    micro = evaluate_mentions(gold, pred).filter("label = 'micro'").collect()[0]
    assert micro["entity_precision"] == pytest.approx(0.5, abs=1e-6)
    assert micro["entity_recall"] == pytest.approx(0.5, abs=1e-6)


def test_malformed_crowd_chunks_dropped_not_fatal(spark, pages):
    """Human-entered annotated_text with malformed chunks ('per/son',
    'abc-x/org') must drop those chunks like misaligned spans, not kill
    the Spark stage; well-formed chunks in the same record survive."""
    got = load(spark, pages, [
        ("Acme Corp acquired Initech .", "per/son abc-x/org 19-25/org 3/loc"),
    ])
    assert got == [("https://a.example.com/1", 3, 4, "ORG")]


def test_out_of_order_chunks_sorted_before_merge(spark, pages):
    """Chunks arriving out of file order ('19-25/org 0-8/company') are
    disjoint spans; the merge must run over (start, end)-sorted spans
    (analysis.py:288) — merging in raw chunk order would wrongly fuse
    them into one inverted span that vanishes downstream."""
    got = load(spark, pages, [
        ("Acme Corp acquired Initech .", "19-25/org 0-8/company"),
    ])
    assert got == [
        ("https://a.example.com/1", 0, 2, "COMPANY"),
        ("https://a.example.com/1", 3, 4, "ORG"),
    ]
