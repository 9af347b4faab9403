from weak_supervision_for_ner_spark.functions.trie import TokenTrie


def make():
    t = TokenTrie()
    t.add_class(("New", "York"), "GPE")
    t.add_class(("New", "York", "Times"), "ORG")
    t.add_class(("Washington",), "GPE")
    t.add_class(("Washington",), "PERSON")
    return t


def test_longest_prefix_prefers_longer():
    t = make()
    assert t.longest_prefix(["New", "York", "Times", "said"]) == (3, ("ORG",))
    assert t.longest_prefix(["New", "York", "is"]) == (2, ("GPE",))
    assert t.longest_prefix(["Old", "York"]) == (0, None)


def test_ambiguous_values_merge():
    t = make()
    assert t.get(("Washington",)) == ("GPE", "PERSON")


def test_case_insensitive():
    t = make()
    assert t.longest_prefix(["new", "york"], case_sensitive=False) == (2, ("GPE",))
    assert t.longest_prefix(["new", "york"], case_sensitive=True) == (0, None)
    assert t.longest_prefix(["NEW", "YORK"], case_sensitive=False) == (2, ("GPE",))


def test_len_and_items():
    t = make()
    assert len(t) == 3
    assert dict(t.items())[("New", "York")] == ("GPE",)


def test_gazetteer_root_gate_matches_ungated_scan():
    """gazetteer_hits inlines longest_prefix_at's first-token lookup as
    a root-membership gate (the ~2x annotation optimization); this pins
    the gate to the trie's semantics: the gated scan must yield the
    SAME hits as a reference scan that calls longest_prefix_at at every
    position, across cased/uncased modes and alt-form-only matches."""
    from weak_supervision_for_ner_spark.functions import lexicons as lx
    from weak_supervision_for_ner_spark.operators.labelling import (
        Doc,
        gazetteer_hits,
    )

    t = make()
    t.add_class(("paris",), "GPE")            # matches 'Paris' only via alts
    t.add_class(("ACME", "Corp"), "COMPANY")

    doc = Doc(
        "Yesterday New York Times wrote that Washington met Paris and "
        "ACME Corp Inc. signed. Plain words stay unmatched near paris."
    )

    def reference(case_sensitive):
        """gazetteer_hits without the root gate — longest_prefix_at
        probed at every position with the identical guards."""
        tokens, n = doc.tokens, len(doc.tokens)
        out, i = [], 0
        while i < n:
            if doc.is_punct[i]:
                i += 1
                continue
            if (i > 0 and doc.likely_proper[i - 1] and doc.in_compound[i - 1]
                    and doc.in_compound[i]):
                i += 1
                continue
            length, value = t.longest_prefix_at(
                tokens, i, min(i + 10, n),
                None if case_sensitive else doc.alt_forms,
            )
            if length:
                if not any(doc.likely_proper[k] for k in range(i, i + length)):
                    i += 1
                    continue
                if (i + length < n and {"ORG", "COMPANY"}.intersection(value)
                        and doc.lower[i + length].rstrip(".") in lx.LEGAL_SUFFIXES):
                    length += 1
                for ne_class in value:
                    out.append((i, i + length, ne_class, 1.0 / len(value)))
                i += length + 1
            else:
                i += 1
        return out

    for cs in (True, False):
        got = list(gazetteer_hits(doc, t, case_sensitive=cs))
        assert got == reference(cs), cs
    # the uncased scan must include the alts-only 'Paris' match
    assert any(lab == "GPE" and doc.tokens[s] == "Paris"
               for (s, e, lab, c) in gazetteer_hits(doc, t, case_sensitive=False))
