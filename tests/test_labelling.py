from weak_supervision_for_ner_spark.operators.labelling import (
    Doc,
    annotate_document,
    date_generator,
    flatten_spans,
    legal_generator,
    merge_contiguous_spans,
    money_generator,
    number_generator,
    time_generator,
)
from weak_supervision_for_ner_spark.sources.gazetteer import FIRST_NAMES, build_gazetteers

GAZ = build_gazetteers()


def spans_of(gen, text):
    doc = Doc(text)
    return {(s, e): lab for s, e, lab in gen(doc)}


def annotate(text):
    return annotate_document(Doc(text), GAZ, FIRST_NAMES)


def test_date_generator_merges_ordinal_of_month_year():
    spans = spans_of(date_generator, "It happened on the 3rd of May 1998 here")
    # "3rd of May" merges with "1998" into one DATE run
    assert spans == {(4, 8): "DATE"}


def test_date_generator_day_and_digit_month():
    spans = spans_of(date_generator, "due Tuesday or 12 March")
    assert (1, 2) in spans and (3, 5) in spans


def test_time_generator():
    assert spans_of(time_generator, "at 4:30 pm sharp") == {(1, 3): "TIME"}
    assert spans_of(time_generator, "around 18:05 today") == {(1, 2): "TIME"}


def test_money_generator_symbol_and_magnitude():
    spans = spans_of(money_generator, "paid $ 149 million for it")
    assert spans == {(1, 4): "MONEY"}
    spans = spans_of(money_generator, "worth 5 bln euros now")
    assert spans == {(1, 4): "MONEY"}
    spans = spans_of(money_generator, "USD 3,400 exactly")
    assert spans == {(0, 2): "MONEY"}


def test_number_generator_kinds():
    doc = Doc("rose 20 % after 644 km and the 21st item of 5 million things")
    kinds = {lab for _, _, lab in number_generator(doc)}
    assert kinds == {"PERCENT", "QUANTITY", "ORDINAL", "CARDINAL"}


def test_legal_generator_reference_and_range():
    spans = spans_of(legal_generator, "Under Article 5, Paragraph 3 of the law")
    assert (1, 6) in spans  # merged across comma


def test_number_excluded_inside_money():
    doc = annotate("It cost $149 yesterday")
    money = set(doc.layers["money_detector"])
    numbers = set(doc.layers["number_detector"])
    for (ms, me) in money:
        for (ns, ne) in numbers:
            assert ne <= ms or ns >= me


def test_conf_renormalisation_caps_at_one():
    doc = Doc("Washington spoke to Washington again and Washington")
    doc.clear("x")
    doc.add("x", 0, 1, "GPE", 0.8)
    doc.add("x", 0, 1, "PERSON", 0.8)
    vals = doc.layers["x"][(0, 1)]
    assert abs(sum(c for _, c in vals) - 1.0) < 1e-9


def test_company_type_and_full_name():
    doc = annotate("Maria Olsen is the CEO of Initech Corp. since May")
    assert any(l == "PERSON" for vals in doc.layers["full_name_detector"].values()
               for l, _ in vals)
    assert any(l == "COMPANY" for vals in doc.layers["company_type_detector"].values()
               for l, _ in vals)


def test_gazetteer_cased_uncased_and_ambiguous():
    # NEW YORK: proper (all-caps) but not the cased trie form, so only
    # the uncased pass hits; lowercase "new york" is skipped by the
    # proper-token guard in BOTH passes (annotations.py:653 semantics).
    doc = annotate("He moved from Oslo to NEW YORK with Washington")
    cased = {doc.span_text(s, e) for (s, e) in doc.layers["geo_cased"]}
    uncased = {doc.span_text(s, e) for (s, e) in doc.layers["geo_uncased"]}
    assert "Oslo" in cased
    assert "NEW YORK" in uncased and "NEW YORK" not in cased
    wiki_vals = [
        vals for (s, e), vals in doc.layers["wiki_cased"].items()
        if doc.span_text(s, e) == "Washington"
    ]
    assert wiki_vals and len(wiki_vals[0]) == 2  # ambiguous PERSON+GPE, conf 0.5 each
    assert all(abs(c - 0.5) < 1e-9 for _, c in wiki_vals[0])


def test_doc_history_propagates_surname():
    doc = annotate("Ingrid Olsen met reporters in Oslo. Later, Olsen declined to comment.")
    history = {doc.span_text(s, e): vals[0][0] for (s, e), vals in doc.layers["doc_history"].items()}
    assert history.get("Olsen") == "PERSON"


def test_doc_majority_requires_two_occurrences():
    doc = annotate(
        "Globex launched the Roomba on Monday. Analysts said Globex beat expectations."
    )
    maj = {doc.span_text(s, e): vals[0][0] for (s, e), vals in doc.layers["doc_majority_cased"].items()}
    assert maj.get("Globex") == "COMPANY"
    assert "Roomba" not in maj  # single occurrence


def test_merge_contiguous_spans_across_comma():
    doc = Doc("Article 5 , Paragraph 3")
    spans = {(0, 2): "LAW", (3, 5): "LAW"}
    assert merge_contiguous_spans(spans, doc) == {(0, 5): "LAW"}


def test_empty_doc():
    doc = annotate("")
    assert flatten_spans(doc) == []


def test_sentence_boundary_quote_repair():
    """_correct_sentence_boundaries (spacy_wrapper.py:225-239): curly
    quotes never induce sentence starts mid-quote."""
    from weak_supervision_for_ner_spark.operators.labelling import Doc

    doc = Doc("He said . “ Prices rose ” yesterday")
    idx = {t: i for i, t in enumerate(doc.tokens)}
    # token after the opening quote is NOT a sentence start even though
    # it follows punctuation-adjacent context
    assert not doc.sent_start[idx["Prices"]]
    # the closing quote itself is not a sentence start, and without a
    # preceding period neither is the following token
    assert not doc.sent_start[idx["”"]]
    assert not doc.sent_start[idx["yesterday"]]
    # document start is always a boundary
    assert doc.sent_start[0]
