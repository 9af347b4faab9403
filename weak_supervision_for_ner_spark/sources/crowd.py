"""Crowd-sourced gold loader (reference analysis.py:213-301,
``get_crowd_data``).

The reference imports externally-annotated gold by matching each crowd
record's ``original_text`` against the EXACT text of a sentence in the
corpus (``sent.text.strip() == v["original_text"].strip()``), then
converting the record's character-offset spans (``"12-17/org"`` tokens
of ``annotated_text``, end inclusive) to token spans via
``doc.char_span`` — a span whose char boundaries do not coincide with
token boundaries is dropped — with ``DATETIME -> DATE`` label mapping
and an overlap-merge that extends the later span backwards over the
earlier one.

Spark re-expression:

1. ``sentence_table(pages)`` — one narrow Arrow stage slicing every doc
   into sentences at terminator tokens, carrying the EXACT raw
   sentence substring (token char offsets preserve the original
   spacing, so the text join is byte-exact like the reference's);
2. sentences are deduplicated by stripped text (first occurrence by
   (url, sentence index) wins — the reference's doc-index key is
   unavailable to an external file, so duplicate sentences would
   otherwise multiply gold);
3. the (small) crowd table broadcast-joins on the stripped text;
4. a second narrow stage parses/aligns the char spans per matched row.

Documented deviation: output spans stay in WHOLE-DOC token coordinates
(url, start, end, label) — the reference re-materializes each sentence
as its own doc because spaCy evaluation is per-doc, while our
evaluation harness joins span tables on (url, start, end), where doc
coordinates compose directly with ``evaluate_mentions``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

SENTENCE_TERMINATORS = {".", "!", "?"}

_SENTENCE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("sent_idx", T.IntegerType()),
    T.StructField("sent_start", T.IntegerType()),   # token offset in doc
    T.StructField("sent_text", T.StringType()),     # exact raw substring
])

_GOLD_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("start", T.IntegerType()),
    T.StructField("end", T.IntegerType()),
    T.StructField("label", T.StringType()),
    T.StructField("conf", T.DoubleType()),
])


def split_sentences(text: str) -> list[tuple[int, int, int, int]]:
    """(tok_start, tok_end, char_start, char_end) per sentence, split
    AFTER each terminator token — the same boundary rule the SVO triple
    window uses, so crowd gold and triples agree on sentences."""
    from weak_supervision_for_ner_spark.functions.tokenizer import (
        tokenize_with_offsets,
    )

    tokens, offsets = tokenize_with_offsets(text)
    out = []
    start = 0
    for i, tok in enumerate(tokens):
        if tok in SENTENCE_TERMINATORS:
            out.append((start, i + 1, offsets[start], offsets[i] + len(tok)))
            start = i + 1
    if start < len(tokens):
        last = len(tokens) - 1
        out.append((start, len(tokens),
                    offsets[start], offsets[last] + len(tokens[last])))
    return out


def sentence_table(pages: DataFrame, lang: str = "en") -> DataFrame:
    """(url, sent_idx, sent_start, sent_text) — exact raw substrings."""
    selected = pages.filter(F.col("lang") == lang).select("url", "text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf["text"]):
                text = text or ""
                for i, (ts, _te, cs, ce) in enumerate(split_sentences(text)):
                    rows.append((url, i, ts, text[cs:ce]))
            yield pd.DataFrame(
                rows, columns=["url", "sent_idx", "sent_start", "sent_text"]
            )

    return selected.mapInPandas(run, schema=_SENTENCE_SCHEMA)


def parse_annotated_text(
    annotated_text: str, sent_text: str, tok_offsets: list[int],
    tok_lens: list[int],
) -> list[tuple[int, int, str]]:
    """Char spans ("12-17/org", end inclusive) -> sentence-relative
    token spans. A span is kept only if its char boundaries coincide
    with token boundaries (the reference's ``doc.char_span`` contract);
    DATETIME maps to DATE; overlapping spans merge by extending the
    later span backwards (analysis.py:288-299, transcribed)."""
    starts = {c: i for i, c in enumerate(tok_offsets)}
    ends = {c + l: i + 1 for i, (c, l) in enumerate(zip(tok_offsets, tok_lens))}
    parsed: list[tuple[int, int, str]] = []
    for chunk in annotated_text.split():
        if "/" not in chunk:
            continue
        # human-entered data: a malformed chunk ("per/son", "abc-x/org")
        # is DROPPED like a misaligned span, never allowed to kill the
        # whole Spark stage
        try:
            label = chunk.split("/")[1].upper()
            label = "DATE" if label == "DATETIME" else label
            char_start = int(chunk.split("-")[0])
            char_end = int(chunk.split("-")[1].split("/")[0]) + 1
        except (ValueError, IndexError):
            continue
        if char_start not in starts or char_end not in ends:
            continue  # misaligned span: dropped like char_span -> None
        parsed.append((starts[char_start], ends[char_end], label))
    # the reference merges over spans SORTED by (start, end)
    # (analysis.py:288 iterates sorted(...) annotation keys); merging in
    # raw chunk-file order would wrongly fuse disjoint out-of-order
    # chunks and emit an inverted span
    spans: list[tuple[int, int, str]] = []
    for start, end, label in sorted(parsed):
        if spans:
            other_start, other_end = spans[-1][0], spans[-1][1]
        else:
            other_start, other_end = 0, 0
        if other_end > start:
            spans = spans[:-1]
            start = other_start
        spans.append((start, end, label))
    return spans


def load_crowd_gold(
    crowd: DataFrame, pages: DataFrame, sentences: DataFrame | None = None
) -> DataFrame:
    """Crowd records (original_text, annotated_text) -> gold mention
    table (url, start, end, label, conf=1.0) in doc token coordinates.

    The corpus side shuffles once (sentence-text dedup window); the
    crowd table is broadcast — it is human-annotated and therefore
    tiny relative to any corpus worth evaluating on. Pass a
    precomputed ``sentence_table(pages)`` via ``sentences`` when the
    caller already has one (deriving records from the corpus itself),
    so the tokenizing sentence pass runs once, not twice."""
    sents = sentence_table(pages) if sentences is None else sentences
    w = Window.partitionBy(F.trim(F.col("sent_text"))).orderBy("url", "sent_idx")
    uniq = (
        sents.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    matched = uniq.join(
        F.broadcast(
            crowd.select(
                F.trim(F.col("original_text")).alias("_key"), "annotated_text"
            )
        ),
        on=F.trim(F.col("sent_text")) == F.col("_key"),
    ).select("url", "sent_start", "sent_text", "annotated_text")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from weak_supervision_for_ner_spark.functions.tokenizer import (
            tokenize_with_offsets,
        )

        for pdf in batches:
            rows = []
            for url, sent_start, sent_text, ann in zip(
                pdf["url"], pdf["sent_start"], pdf["sent_text"], pdf["annotated_text"]
            ):
                # the crowd offsets are relative to the (stripped)
                # sentence text, exactly like the reference's
                # sent.start_char + start
                stripped = sent_text.strip()
                toks, offs = tokenize_with_offsets(stripped)
                lens = [len(t) for t in toks]
                for s, e, lab in parse_annotated_text(ann, stripped, offs, lens):
                    rows.append(
                        (url, int(sent_start) + s, int(sent_start) + e, lab, 1.0)
                    )
            yield pd.DataFrame(
                rows, columns=["url", "start", "end", "label", "conf"]
            )

    return matched.mapInPandas(run, schema=_GOLD_SCHEMA)
