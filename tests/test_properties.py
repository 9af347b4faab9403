"""Property-based tests (hypothesis) for the invariants the reference
enforces at runtime (SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from weak_supervision_for_ner_spark.functions.tokenizer import tokenize_with_offsets
from weak_supervision_for_ner_spark.functions.trie import TokenTrie
from weak_supervision_for_ner_spark.operators.labelling import Doc

text_strategy = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x24F),
    max_size=200,
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_tokenizer_offsets_always_exact_slices(text):
    tokens, offsets = tokenize_with_offsets(text)
    assert len(tokens) == len(offsets)
    for tok, off in zip(tokens, offsets):
        assert text[off : off + len(tok)] == tok
        assert tok  # no empty tokens
    # monotone offsets
    assert all(a < b for a, b in zip(offsets, offsets[1:]))


@settings(max_examples=100, deadline=None)
@given(text_strategy)
def test_doc_construction_never_crashes(text):
    doc = Doc(text)
    assert len(doc.likely_proper) == len(doc.tokens)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.floats(0.01, 1.0), st.sampled_from(["GPE", "PERSON", "ORG"])),
        min_size=1, max_size=6,
    )
)
def test_conf_mass_never_exceeds_one(vals):
    doc = Doc("Oslo and Bergen and Stavanger meet")
    doc.clear("x")
    for conf, label in vals:
        doc.add("x", 0, 1, label, conf)
    for span_vals in doc.layers["x"].values():
        assert sum(c for _, c in span_vals) <= 1.0 + 1e-9


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "New", "York"]), min_size=1, max_size=4),
        min_size=1, max_size=20,
    )
)
def test_trie_longest_prefix_consistent_with_get(keys):
    trie = TokenTrie()
    for k in keys:
        trie.add_class(tuple(k), "X")
    for k in keys:
        length, value = trie.longest_prefix(tuple(k))
        assert length >= 1 and value is not None
        # longest_prefix of key + sentinel still finds at least the key
        length2, _ = trie.longest_prefix((*k, "ZZZ"))
        assert length2 >= length or tuple(k)[:length2] in trie


@settings(max_examples=30, deadline=None)
@given(st.integers(0, 10_000))
def test_page_generation_deterministic_and_valid(doc_id):
    from weak_supervision_for_ner_spark.sources.pages import (
        extract_text_from_html,
        make_page_full,
    )

    p1, g1, t1 = make_page_full(doc_id)
    p2, g2, t2 = make_page_full(doc_id)
    assert p1 == p2 and g1 == g2 and t1 == t2
    assert extract_text_from_html(p1["html"]) == p1["text"]
    for (s, e, label) in g1:
        assert 0 <= s < e <= len(p1["text"])
