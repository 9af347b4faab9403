"""Headline benchmark. Prints ONE JSON line:
{"metric": ..., "value": sec, "unit": "sec", "queries": {...}, "sf": ...}

Runs on local[$SPARK_GRAFT_CPUS] against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1). Headline = the end-to-end KG-construction
pipeline (annotate -> majority-vote -> triples -> link -> canonicalize)
over the deterministic synthetic pages corpus, plus the HMM fit+decode
path, the dedup/ANN/text-stats table ops and two relational shapes.
Also reports pipeline docs/sec (BASELINE.json metric).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    load_at_start = round(os.getloadavg()[0], 2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entrymod
    from weak_supervision_for_ner_spark.config import get_spark

    spark = get_spark("wsner-bench", cores=cores, shuffle_partitions=cores)
    # Warm the JVM, python workers AND the whole-stage-codegen cache:
    # run the heavy pipelines once on a tiny corpus (plan shapes are
    # identical, so the sf-scale timings below measure the engine, not
    # one-time Janino compilation).
    spark.range(1000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    for warm_fn in (entrymod.q_pages_triples, entrymod.q_pages_hmm):
        try:
            warm_fn(spark, warm_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"# warmup failed: {exc}", file=sys.stderr)

    n_docs = entrymod._n_docs(sf_dir)
    timings: dict[str, float] = {}

    def run(name: str, fn) -> None:
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)

    run("kg_pipeline_mv", entrymod.q_pages_triples)
    run("hmm_fit_decode", entrymod.q_pages_hmm)
    run("mentions_all_sources", entrymod.q_pages_mentions)
    run("dedup_minhash_lsh", entrymod.q_minhash_lsh_pairs)
    run("dedup_ngram_jaccard", entrymod.q_dedup_ngram_jaccard)
    run("simhash_pairs", entrymod.q_simhash)
    run("ann_topk", entrymod.q_ann_topk)
    run("agg_rollup", entrymod.q_agg_rollup)
    run("join_equi", entrymod.q_join_equi)
    run("events_windowed", entrymod.q_events_windowed)
    run("quality_scores", entrymod.q_quality_scores)

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(n_docs / timings["kg_pipeline_mv"], 1)
    print(json.dumps({
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_docs": n_docs,
        "kg_docs_per_sec": docs_per_sec,
        "cores": cores,
        # 1-minute load when the bench STARTED: non-zero means the
        # sandbox had background load and timings are inflated (the
        # box's documented noise can double them; see BENCH_SCALING.md).
        "load_1m_at_start": load_at_start,
    }))


if __name__ == "__main__":
    main()
