"""Deterministic, substring-preserving tokenizer.

This is the engine's canonical tokenizer. Semantics follow the
reference's fast tokenizer (utils.py:110-147) and its token-correction
rules (spacy_wrapper.py:133-183): whitespace split, hyphen splitting,
``USD3,400`` / ``5bln`` style splits, genitive ``'s`` splitting,
punctuation peeling, abbreviation-aware trailing periods.

Every rule is substring-preserving: each emitted token is an exact
slice of the input text, so character offsets are exact and the
``text`` column round-trips byte-identically per url (BASELINE.json
input_hint invariant).
"""

from __future__ import annotations

import re

from weak_supervision_for_ner_spark.functions.lexicons import (
    CURRENCY_SYMBOLS,
    DAYS_ABBRV,
    LEGAL_SUFFIXES,
    MONTHS_ABBRV,
)

_ABBREVIATIONS = (
    {a.lower() for a in MONTHS_ABBRV | DAYS_ABBRV}
    | {s + "." for s in LEGAL_SUFFIXES}
    | {"mr.", "mrs.", "ms.", "dr.", "st.", "prof.", "jr.", "sr.", "vs.", "etc.", "no."}
)

_PEEL_PUNCT = set(".,;:!?()[]{}\"'`“”‘’«»…&*<>=~^|\\")
_CURRENCY_CHARS = {s for s in CURRENCY_SYMBOLS if len(s) == 1} | set("$€£¥₽₹₪₺%#§")

_ALPHA_NUM_RE = re.compile(r"^([A-Za-z]+)(\d[\d.,]*)$")          # USD3,400
_NUM_ALPHA_RE = re.compile(r"^(\d[\d.,]*)([A-Za-z]+)$")          # 5bln, 3G
_NUM_SUFFIXES = {"st", "nd", "rd", "th", "s"}                    # 21st, 1990s stay whole
_MULTI_INITIAL_RE = re.compile(r"^(?:[A-Za-z]\.)+[A-Za-z]?\.?$")  # U.S., U.N.


def _is_abbreviation(chunk: str) -> bool:
    if _MULTI_INITIAL_RE.match(chunk):
        return True
    return chunk.lower() in _ABBREVIATIONS


def _split_chunk(chunk: str, offset: int, out: list[tuple[str, int]]) -> None:
    """Recursively split one whitespace-delimited chunk into tokens."""
    if not chunk:
        return

    # Peel leading punctuation / currency symbols one char at a time.
    ch = chunk[0]
    if ch in _PEEL_PUNCT or ch in _CURRENCY_CHARS:
        if len(chunk) == 1 or not _is_abbreviation(chunk):
            out.append((ch, offset))
            _split_chunk(chunk[1:], offset + 1, out)
            return

    # Peel trailing punctuation, except abbreviation periods and
    # genitive apostrophes handled below.
    last = chunk[-1]
    if last in _PEEL_PUNCT or last in _CURRENCY_CHARS:
        keep_period = last == "." and _is_abbreviation(chunk)
        if not keep_period and not (last == "s" or chunk.endswith("'s")):
            _split_chunk(chunk[:-1], offset, out)
            out.append((last, offset + len(chunk) - 1))
            return

    # Genitive: Obama's -> Obama / 's  (utils.py:136-144 semantics)
    if chunk.endswith("'s") or chunk.endswith("’s"):
        head = chunk[:-2]
        if head:
            _split_chunk(head, offset, out)
        out.append((chunk[-2:], offset + len(chunk) - 2))
        return

    # Hyphenated tokens: Jean-Pierre -> Jean / - / Pierre
    if "-" in chunk and len(chunk) > 1 and not any(c.isdigit() for c in chunk):
        parts = chunk.split("-")
        pos = offset
        for j, part in enumerate(parts):
            if part:
                _split_chunk(part, pos, out)
            pos += len(part)
            if j < len(parts) - 1:
                out.append(("-", pos))
                pos += 1
        return

    # USD3,400 -> USD / 3,400   (spacy_wrapper.py:133-183 semantics)
    m = _ALPHA_NUM_RE.match(chunk)
    if m:
        out.append((m.group(1), offset))
        _split_chunk(m.group(2), offset + len(m.group(1)), out)
        return

    # 5bln -> 5 / bln ; 3G -> 3 / G ; but 21st / 1990s stay whole
    m = _NUM_ALPHA_RE.match(chunk)
    if m and m.group(2).lower() not in _NUM_SUFFIXES:
        out.append((m.group(1), offset))
        out.append((m.group(2), offset + len(m.group(1))))
        return

    out.append((chunk, offset))


def tokenize_with_offsets(text: str) -> tuple[list[str], list[int]]:
    """Tokenize ``text``; returns (tokens, start_char_offsets)."""
    out: list[tuple[str, int]] = []
    i = 0
    n = len(text)
    while i < n:
        if text[i].isspace():
            i += 1
            continue
        j = i
        while j < n and not text[j].isspace():
            j += 1
        _split_chunk(text[i:j], i, out)
        i = j
    tokens = [t for t, _ in out if t]
    offsets = [o for t, o in out if t]
    return tokens, offsets


def tokenize(text: str) -> list[str]:
    return tokenize_with_offsets(text)[0]
