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
