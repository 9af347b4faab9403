"""Generate the EXTERNAL crowd-annotation fixture for the sf0.01
driver corpus, plus the expected gold output as a parquet oracle.

The reference loads crowd gold from an external JSON file
(analysis.py:252, ``data/second_launch_annotations.json``) whose
records look like {"original_text": ..., "annotated_text":
"12-17/org ..."}; the interesting code paths are the records that DO
NOT line up with the corpus — misses, misaligned char spans, malformed
chunks, DATETIME mapping, out-of-order chunks. A fixture derived
in-flight from the corpus' own sentences (the r3 gate) could never
miss; this one deliberately includes every failure mode so the driver
gate exercises the drop/merge paths end-to-end.

The expected output is computed here by the SAME per-sentence core
(split_sentences / tokenize_with_offsets / parse_annotated_text) in a
plain python loop — the plans/oracle.py pattern — and checked in as a
parquet the DuckDB side of the gate reads.

Regenerate after any tokenizer/sentence/crowd-semantics change:

    python scripts/make_crowd_fixture.py
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weak_supervision_for_ner_spark.functions.tokenizer import (  # noqa: E402
    tokenize_with_offsets,
)
from weak_supervision_for_ner_spark.sources.crowd import (  # noqa: E402
    parse_annotated_text,
    split_sentences,
)
from weak_supervision_for_ner_spark.sources.pages import make_page  # noqa: E402

N_DOCS = 1200  # __spark_entry__._n_docs for sf0.01
SEED = 42
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "fixtures")


def corpus_sentences():
    """(url, sent_idx, sent_start, sent_text) for every en doc — the
    single-node mirror of sources.crowd.sentence_table."""
    rows = []
    for i in range(N_DOCS):
        page, _ = make_page(i, SEED)
        if page.get("lang", "en") != "en":
            continue
        text = page["text"] or ""
        for idx, (ts, _te, cs, ce) in enumerate(split_sentences(text)):
            rows.append((page["url"], idx, ts, text[cs:ce]))
    return rows


def token_char_range(stripped: str, tok_idx: int) -> tuple[int, int] | None:
    """Inclusive char range of token ``tok_idx`` ("start-end" chunk
    convention) in the stripped sentence, or None if out of range."""
    toks, offs = tokenize_with_offsets(stripped)
    if tok_idx >= len(toks):
        return None
    return offs[tok_idx], offs[tok_idx] + len(toks[tok_idx]) - 1


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    sents = corpus_sentences()

    # candidate sentences: first sentence of a doc, non-empty, >= 4
    # tokens — deterministic order by (url, sent_idx)
    candidates = []
    seen_texts = set()
    for url, idx, start, text in sents:
        stripped = text.strip()
        if idx != 0 or len(stripped) < 10:
            continue
        if stripped in seen_texts:
            continue
        toks, _ = tokenize_with_offsets(stripped)
        if len(toks) < 4:
            continue
        seen_texts.add(stripped)
        candidates.append(stripped)
        if len(candidates) >= 24:
            break

    records: dict[str, dict] = {}

    def add(kind: str, original: str, annotated: str) -> None:
        records[f"{kind}_{len(records):03d}"] = {
            "source": "synthetic-crowd",
            "original_text": original,
            "annotated_text": annotated,
        }

    # 1..16: plain valid records — first token annotated as person
    for s in candidates[:16]:
        r = token_char_range(s, 0)
        add("valid", s, f"{r[0]}-{r[1]}/person")

    # 17: DATETIME -> DATE mapping on token 2
    s = candidates[16]
    r = token_char_range(s, 2)
    add("datetime", s, f"{r[0]}-{r[1]}/datetime")

    # 18: misaligned span (starts mid-token) -> dropped
    s = candidates[17]
    r = token_char_range(s, 0)
    add("misaligned", s, f"{r[0] + 1}-{r[1] + 3}/org")

    # 19: malformed chunks + one valid chunk (only the valid survives)
    s = candidates[18]
    r = token_char_range(s, 1)
    add("malformed", s, f"per/son abc-x/org 3/loc {r[0]}-{r[1]}/org")

    # 20: out-of-order chunks (token 2 chunk before token 0 chunk) —
    # disjoint spans that must NOT merge
    s = candidates[19]
    r0, r2 = token_char_range(s, 0), token_char_range(s, 2)
    add("outoforder", s, f"{r2[0]}-{r2[1]}/org {r0[0]}-{r0[1]}/company")

    # 21: overlapping spans -> later span extended backwards
    s = candidates[20]
    r01 = token_char_range(s, 0)[0], token_char_range(s, 1)[1]
    r12 = token_char_range(s, 1)[0], token_char_range(s, 2)[1]
    add("overlap", s, f"{r01[0]}-{r01[1]}/company {r12[0]}-{r12[1]}/person")

    # 22: sentence that exists nowhere in the corpus -> zero rows
    add("nomatch", "This sentence appears nowhere in the corpus at all .",
        "0-3/org")

    # 23-24: two records for the SAME sentence (multi-record join)
    s = candidates[21]
    add("multi_a", s, f"{token_char_range(s, 0)[0]}-{token_char_range(s, 0)[1]}/person")
    add("multi_b", s, f"{token_char_range(s, 3)[0]}-{token_char_range(s, 3)[1]}/gpe")

    with open(os.path.join(OUT_DIR, "crowd_records_sf0.01.json"), "w") as fd:
        json.dump(records, fd, indent=1)
    print(f"crowd records: {len(records)}")

    # ---- expected gold (single-node mirror of load_crowd_gold) ----
    # dedup: first (url, sent_idx) occurrence per stripped sentence text
    first_occurrence: dict[str, tuple[str, int, int, str]] = {}
    for url, idx, start, text in sorted(sents, key=lambda r: (r[0], r[1])):
        key = text.strip()
        if key and key not in first_occurrence:
            first_occurrence[key] = (url, idx, start, text)

    gold_rows = []
    for rec in records.values():
        key = rec["original_text"].strip()
        hit = first_occurrence.get(key)
        if hit is None:
            continue
        url, _idx, sent_start, sent_text = hit
        stripped = sent_text.strip()
        toks, offs = tokenize_with_offsets(stripped)
        lens = [len(t) for t in toks]
        for s_, e_, lab in parse_annotated_text(
            rec["annotated_text"], stripped, offs, lens
        ):
            gold_rows.append((url, sent_start + s_, sent_start + e_, lab, 1.0))

    tbl = pa.Table.from_arrays(
        [
            pa.array([r[0] for r in gold_rows], type=pa.string()),
            pa.array([r[1] for r in gold_rows], type=pa.int32()),
            pa.array([r[2] for r in gold_rows], type=pa.int32()),
            pa.array([r[3] for r in gold_rows], type=pa.string()),
            pa.array([r[4] for r in gold_rows], type=pa.float64()),
        ],
        names=["url", "start", "end", "label", "conf"],
    )
    pq.write_table(tbl, os.path.join(OUT_DIR, "oracle_crowd_gold_sf0.01.parquet"))
    print(f"expected gold rows: {len(gold_rows)}")


if __name__ == "__main__":
    main()
