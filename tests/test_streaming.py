"""Structured Streaming ingestion: the stateless annotation stage must
produce the same mentions as batch over the same files."""

import pytest


def test_streaming_mentions_equal_batch(spark, tmp_path):
    from weak_supervision_for_ner_spark.operators.annotate import (
        annotate_pages,
        mentions_from_annotated,
    )
    from weak_supervision_for_ner_spark.sources.pages import synth_pages
    from weak_supervision_for_ner_spark.streaming.ingest import run_stream_to_parquet

    in_path = str(tmp_path / "pages")
    out_path = str(tmp_path / "mentions")
    ckpt = str(tmp_path / "ckpt")
    pages = synth_pages(spark, 40, partitions=2)
    pages.write.parquet(in_path)

    run_stream_to_parquet(spark, in_path, out_path, ckpt, timeout_sec=120)

    got = {
        (r["url"], r["source"], r["start"], r["end"], r["label"])
        for r in spark.read.parquet(out_path).collect()
    }
    want = {
        (r["url"], r["source"], r["start"], r["end"], r["label"])
        for r in mentions_from_annotated(
            annotate_pages(spark.read.parquet(in_path))
        ).collect()
    }
    assert got == want and got


def test_streaming_windowed_counts(spark, tmp_path):
    from weak_supervision_for_ner_spark.sources.pages import synth_pages
    from weak_supervision_for_ner_spark.streaming.ingest import (
        read_pages_stream,
        streaming_mention_counts,
    )

    in_path = str(tmp_path / "pages2")
    synth_pages(spark, 30, partitions=2).write.parquet(in_path)
    # complete mode: append would emit only windows already finalized
    # by the watermark, which needs >=2 microbatches to advance — with
    # availableNow + few files the result would be empty.
    q = (
        streaming_mention_counts(read_pages_stream(spark, in_path))
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from win_counts").collect()
    assert rows
    assert all(r["n_mentions"] > 0 for r in rows)
