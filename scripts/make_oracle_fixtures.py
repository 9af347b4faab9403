"""Materialize the single-node oracle's output for the sf0.01 driver
corpus as parquet fixtures the DuckDB side of the correctness gate can
read (the same pattern the ann_ivf oracle uses for its centroids).

This upgrades pages_mentions / pages_majority / distill_dataset from
rows-only driver checks to full rows+schema+hash gates: the Spark side
runs the distributed pipeline, the DuckDB side reads THESE fixtures —
computed by the independent pure-python oracle (plans/oracle.py) with
no Spark involved — so the comparison is a genuine cross-check, not a
self-join.

The fixtures are tied to the sf0.01 synthetic corpus (n_docs=1200,
seed=42 — __spark_entry__._n_docs), which is the scale the driver pins
its gate at. Regenerate after any labelling-semantics change:

    python scripts/make_oracle_fixtures.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weak_supervision_for_ner_spark.plans.oracle import (  # noqa: E402
    oracle_annotate,
    oracle_majority_mentions,
)
from weak_supervision_for_ner_spark.sources.pages import make_page  # noqa: E402

N_DOCS = 1200  # _n_docs("/root/testdata/sf0.01")
SEED = 42
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "fixtures")

MENTION_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("source", pa.string()),
    ("start", pa.int32()),
    ("end", pa.int32()),
    ("label", pa.string()),
    ("conf", pa.float64()),
    ("text", pa.string()),
])


def _mention_table(rows) -> pa.Table:
    cols = list(zip(*rows)) if rows else [[] for _ in MENTION_SCHEMA.names]
    return pa.Table.from_arrays(
        [pa.array(c, type=f.type) for c, f in zip(cols, MENTION_SCHEMA)],
        schema=MENTION_SCHEMA,
    )


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    pages = [make_page(i, SEED)[0] for i in range(N_DOCS)]
    annotated = oracle_annotate(pages)  # lang filter + default (no-truecase) path
    print(f"annotated {len(annotated)}/{N_DOCS} docs")

    # tokens(url, tokens) — the distill oracle's input
    tok_tbl = pa.Table.from_arrays(
        [
            pa.array([d["url"] for d in annotated], type=pa.string()),
            pa.array([list(d["tokens"]) for d in annotated],
                     type=pa.list_(pa.string())),
        ],
        names=["url", "tokens"],
    )
    pq.write_table(tok_tbl, os.path.join(OUT_DIR, "oracle_tokens_sf0.01.parquet"))

    # mentions(url, source, start, end, label, conf, text) — all sources,
    # exactly mentions_from_annotated's explode shape
    m_rows = []
    for d in annotated:
        toks = d["tokens"]
        for source, start, end, label, conf in d["spans"]:
            m_rows.append((d["url"], source, int(start), int(end),
                           label, float(conf), " ".join(toks[start:end])))
    pq.write_table(_mention_table(m_rows),
                   os.path.join(OUT_DIR, "oracle_mentions_sf0.01.parquet"))
    print(f"mentions: {len(m_rows)} rows")

    # majority-voter mentions
    mv_rows = [tuple(r) for r in oracle_majority_mentions(annotated)]
    pq.write_table(_mention_table(mv_rows),
                   os.path.join(OUT_DIR, "oracle_majority_sf0.01.parquet"))
    print(f"majority: {len(mv_rows)} rows")


if __name__ == "__main__":
    main()
