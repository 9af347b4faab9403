"""Truecasing of short documents (reference: spacy_wrapper.py:186-221).

For documents up to ``max_tokens`` tokens (news headlines are often
ALL-CAPS), replace token forms whose observed casing is improbable with
the most likely casing from a corpus-derived frequency table. The
reference ships a static ``form_frequencies.json``
(spacy_wrapper.py:67-69); at scale the dictionary is derived from the
corpus itself (``operators.textstats.collect_form_frequency_dict``)
and broadcast into the annotation stage.

Pure function — used inside the Arrow annotation stage AND by the
single-node oracle, so distributed output equals the oracle by
construction.
"""

from __future__ import annotations

# lowercase form -> {surface form: count}
FormFreqs = dict[str, dict[str, int]]


def truecase_tokens(
    tokens: list[str],
    sent_start: list[bool],
    form_freqs: FormFreqs,
    max_tokens: int = 25,
    min_prob: float = 0.25,
) -> list[str]:
    """Reference semantics (spacy_wrapper.py:186-212): tokens that
    (1) are alphabetic with an uppercase first letter,
    (2) are not sentence-initial,
    (3) whose observed casing has relative frequency < ``min_prob``
    are replaced by the most frequent casing of that form. Documents
    longer than ``max_tokens`` pass through unchanged (truecasing
    targets titles/headlines, not running text).

    Deviation (documented): ties between equally-frequent forms break
    on the lexicographically greatest form instead of the reference's
    dict-insertion order, which is not stable across corpora shards.
    """
    if len(tokens) > max_tokens:
        return tokens
    out = list(tokens)
    for i, tok in enumerate(tokens):
        if sent_start[i] or not tok.isalpha() or not tok[0].isupper():
            continue
        freqs = form_freqs.get(tok.lower())
        if not freqs:
            continue
        total = sum(freqs.values())
        if total > 0 and freqs.get(tok, 0) / total < min_prob:
            out[i] = max(freqs.items(), key=lambda kv: (kv[1], kv[0]))[0]
    return out
