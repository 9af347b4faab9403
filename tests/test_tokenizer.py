from weak_supervision_for_ner_spark.functions.tokenizer import (
    tokenize,
    tokenize_with_offsets,
)


def test_basic_split():
    assert tokenize("The quick brown fox.") == ["The", "quick", "brown", "fox", "."]


def test_genitive():
    assert tokenize("Obama's speech") == ["Obama", "'s", "speech"]


def test_hyphen():
    assert tokenize("Jean-Pierre arrived") == ["Jean", "-", "Pierre", "arrived"]


def test_currency_prefix_number():
    assert tokenize("costs USD3,400 or $149") == ["costs", "USD", "3,400", "or", "$", "149"]


def test_digit_alpha_split_and_ordinals():
    assert tokenize("5bln and 3G but 21st and 1990s") == [
        "5", "bln", "and", "3", "G", "but", "21st", "and", "1990s",
    ]


def test_abbreviations_keep_period():
    assert tokenize("Acme Inc. on Sept. 3") == ["Acme", "Inc.", "on", "Sept.", "3"]
    assert tokenize("the U.S. economy") == ["the", "U.S.", "economy"]


def test_time_and_percent():
    assert tokenize("at 4:30 pm, 20% up") == ["at", "4:30", "pm", ",", "20", "%", "up"]


def test_offsets_are_exact_slices():
    text = 'He said "Oslo is nice." IT WAS 20% ABOVE on the 3rd of May 1998.'
    tokens, offsets = tokenize_with_offsets(text)
    for tok, off in zip(tokens, offsets):
        assert text[off : off + len(tok)] == tok


def test_empty_and_whitespace():
    assert tokenize("") == []
    assert tokenize("   \n\t ") == []
