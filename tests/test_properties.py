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


@given(st.lists(st.sampled_from(["Oslo", "OSLO", "oslo", "THE", "the", "a", "."]),
                min_size=0, max_size=30))
def test_truecase_preserves_shape_and_nonalpha(tokens):
    from weak_supervision_for_ner_spark.functions.truecase import truecase_tokens

    freqs = {"oslo": {"Oslo": 95, "OSLO": 5}, "the": {"the": 90, "THE": 10}}
    sent_start = [i == 0 for i in range(len(tokens))]
    out = truecase_tokens(tokens, sent_start, freqs)
    assert len(out) == len(tokens)
    for before, after in zip(tokens, out):
        # only alpha, upper-initial, non-sentence-start tokens may change,
        # and never their lowercase identity
        if before != after:
            assert before.isalpha() and before[0].isupper()
            assert before.lower() == after.lower()
    # sentence-initial token never changes
    if tokens:
        assert out[0] == tokens[0]


@given(st.lists(
    st.tuples(st.integers(0, 18), st.integers(1, 4),
              st.sampled_from(["MONEY", "CARDINAL", "DATE", "PERSON", "ORG"])),
    min_size=0, max_size=6,
))
@settings(deadline=None)
def test_entity_correction_output_sorted_nonoverlapping(raw):
    from weak_supervision_for_ner_spark.operators.entity_correction import (
        correct_entity_spans,
    )

    tokens = "it cost $ 5 billion to buy Initech Ltd. in Q1 won per cent 520.0p # x y z".split()
    # build non-overlapping input spans (the frame the reference gets)
    ents, cursor = [], 0
    for start, length, label in sorted(raw):
        s = max(start, cursor)
        e = min(s + length, len(tokens))
        if s >= e:
            continue
        ents.append((s, e, label))
        cursor = e
    out = correct_entity_spans(tokens, ents)
    for (s1, e1, _), (s2, e2, _) in zip(out, out[1:]):
        assert s1 <= s2, "output must stay sorted"
        assert e1 <= s2, f"overlap survived the merge loop: {(s1,e1)} vs {(s2,e2)}"
    for s, e, lab in out:
        assert 0 <= s < e
        assert lab and isinstance(lab, str)


@given(st.lists(st.text(alphabet="abcdef ", min_size=1, max_size=12),
                min_size=1, max_size=40))
@settings(deadline=None, max_examples=30)
def test_simhash_packed_agg_equals_naive(tokens):
    """The 20-accumulator packed-popcount fingerprint must equal the
    naive per-bit majority computed in plain Python from the same md5
    bit definition."""
    import hashlib

    toks = [t for t in " ".join(tokens).split() if t]
    if not toks:
        return
    hashes = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    naive = 0
    for b in range(60):
        ones = sum((h >> b) & 1 for h in hashes)
        if 2 * ones > len(hashes):
            naive |= 1 << b
    # packed-field arithmetic, mirroring simhash_table's agg exactly
    W, FIELDS = 20, 3
    accs = [0] * (60 // FIELDS)
    for h in hashes:
        for g in range(len(accs)):
            for k in range(FIELDS):
                accs[g] += ((h >> (g * FIELDS + k)) & 1) << (W * k)
    packed = 0
    for g in range(len(accs)):
        for k in range(FIELDS):
            ones = (accs[g] >> (W * k)) & ((1 << W) - 1)
            if 2 * ones > len(hashes):
                packed |= 1 << (g * FIELDS + k)
    assert packed == naive
