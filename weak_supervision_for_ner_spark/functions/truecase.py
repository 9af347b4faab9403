"""Truecasing of short documents (reference: spacy_wrapper.py:186-221).

For documents up to ``max_tokens`` tokens (news headlines are often
ALL-CAPS), replace token forms whose observed casing is improbable
with the majority form from a corpus-derived frequency table
(``operators.textstats.form_frequencies``; the reference ships a
static ``form_frequencies.json`` instead).

Pure function — usable inside the Arrow annotation stage with the
frequency dict broadcast, and by the single-node oracle.
"""

from __future__ import annotations

FormFreqs = dict[str, tuple[str, int, int]]  # lform -> (majority_form, n_majority, n_total)


def truecase_tokens(
    tokens: list[str],
    form_freqs: FormFreqs,
    max_tokens: int = 25,
    min_prob: float = 0.25,
) -> list[str]:
    """Return tokens with improbably-cased forms replaced by their
    majority casing. Docs longer than ``max_tokens`` pass through
    unchanged (long running text is presumed already well-cased)."""
    if len(tokens) > max_tokens:
        return tokens
    out = []
    for tok in tokens:
        entry = form_freqs.get(tok.lower())
        if entry is None or tok == entry[0]:
            out.append(tok)
            continue
        majority_form, n_majority, n_total = entry
        # If the majority form clearly dominates the corpus statistics,
        # the observed minority casing is improbable — rewrite it.
        majority_share = n_majority / max(n_total, 1)
        if majority_share >= (1.0 - min_prob):
            out.append(majority_form)
        else:
            out.append(tok)
    return out
