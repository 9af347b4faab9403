"""The Spark annotation stage.

The reference's ``FullAnnotator().add_all().annotate_docbin(path)``
(annotations.py:261-273, 193-220) becomes ONE narrow Arrow-batched
``mapInPandas`` stage: tokenize → every labelling function → doc-level
annotators, all row-local, zero shuffles (SURVEY.md §3.1). Catalyst
prunes ``html`` out of the scan because only ``url``/``text`` are
touched.

Gazetteer tries are built once per executor via a lazy module
singleton (the broadcast-dictionary pattern; annotations.py:386-390
caches the vocab the same way).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from weak_supervision_for_ner_spark.operators.labelling import (
    Doc,
    annotate_document,
    flatten_spans,
)
from weak_supervision_for_ner_spark.schema import ANNOTATED_SCHEMA

_RESOURCES = None


def _get_resources():
    """Per-executor lazy singleton: (gazetteer tries, first-name set)."""
    global _RESOURCES
    if _RESOURCES is None:
        from weak_supervision_for_ner_spark.sources.gazetteer import (
            FIRST_NAMES,
            build_gazetteers,
        )

        _RESOURCES = (build_gazetteers(), FIRST_NAMES)
    return _RESOURCES


def annotate_batch(
    texts: "pd.Series[str]", form_freqs: dict | None = None
) -> list[tuple[list, list]]:
    """Annotate one Arrow batch; returns (tokens, spans) per row.

    Per-document error isolation (the reference swallows per-doc
    failures, annotations.py:240-243): a failing doc yields its tokens
    (or none) with ZERO spans instead of killing the partition; the
    pipeline's metrics pass surfaces the count."""
    gazetteers, first_names = _get_resources()
    out = []
    for text in texts:
        try:
            doc = annotate_document(
                Doc(text or "", form_freqs=form_freqs), gazetteers, first_names
            )
            out.append((doc.tokens, flatten_spans(doc)))
        except Exception:  # noqa: BLE001 — quarantine, don't fail the partition
            try:
                tokens = Doc(text or "").tokens
            except Exception:  # noqa: BLE001
                tokens = []
            out.append((tokens, []))
    return out


def annotate_pages(
    pages: DataFrame,
    lang: str = "en",
    truecase: bool = False,
    form_freqs: dict | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → annotated(url, tokens, spans).

    One narrow stage; the lang filter is pushed into the scan.

    With ``truecase=True`` the casing dictionary is derived from the
    corpus itself (one groupBy + bounded driver collect,
    textstats.collect_form_frequency_dict) and shipped to executors via
    a Spark broadcast, then short/ALL-CAPS docs get case repair before
    labelling (spacy_wrapper.py:186-221). Pass ``form_freqs`` to reuse
    a precomputed dictionary.
    """
    selected = pages.filter(F.col("lang") == lang).select("url", "text")
    bc = None
    if truecase or form_freqs is not None:
        if form_freqs is None:
            from weak_supervision_for_ner_spark.operators.textstats import (
                collect_form_frequency_dict,
            )

            form_freqs = collect_form_frequency_dict(selected)
        bc = selected.sparkSession.sparkContext.broadcast(form_freqs)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        freqs = bc.value if bc is not None else None
        for pdf in batches:
            annotated = annotate_batch(pdf["text"], form_freqs=freqs)
            yield pd.DataFrame(
                {
                    "url": pdf["url"].values,
                    "tokens": [a[0] for a in annotated],
                    "spans": [a[1] for a in annotated],
                }
            )

    return selected.mapInPandas(run, schema=ANNOTATED_SCHEMA)


def mentions_from_annotated(annotated: DataFrame) -> DataFrame:
    """Explode the per-doc span arrays into the long relational
    ``mentions(url, source, start, end, label, conf, text)`` table
    (SURVEY.md §1.3)."""
    return (
        annotated
        .select("url", "tokens", F.explode("spans").alias("m"))
        .select(
            "url",
            F.col("m.source").alias("source"),
            F.col("m.start").alias("start"),
            F.col("m.end").alias("end"),
            F.col("m.label").alias("label"),
            F.col("m.conf").alias("conf"),
            F.array_join(F.slice("tokens", F.col("m.start") + 1,
                                 F.col("m.end") - F.col("m.start")), " ").alias("text"),
        )
    )


def write_mentions(
    mentions: DataFrame, target: str, buckets: int = 32, fmt: str = "parquet"
) -> None:
    """Sink: salted repartition on url-hash (hot-domain skew, SURVEY.md
    §4), source-partitioned for layer pruning. ``fmt="iceberg"`` writes
    to a catalog table via writeTo/overwritePartitions
    (sinks.write_table)."""
    from weak_supervision_for_ner_spark.sinks import write_table

    write_table(mentions, target, fmt=fmt, partition_by=("source",),
                bucket_col="url", buckets=buckets)
