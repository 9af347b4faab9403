"""Extra measurement harness for the optimization rounds (guide §1).

NOT the frozen driver bench — bench.py stays the measured artifact.
This file exists so individual queries can be isolated, re-timed and
plan-captured without editing bench.py:

  python bench_extra.py --queries ann_brute_jvm_200q,hmm_fit_decode \
      --runs 2 --sink count --plans plans/r07 --suffix before

- times each query with the SAME methodology as bench.py (fresh
  DataFrame per run, df.count(), best-of-N, cache cleared between
  runs) or with the noop sink (--sink noop) to force every column;
- writes .explain("formatted") to --plans/<query>_<suffix>.txt;
- labels jobs via setJobDescription so UI/event logs are readable;
- honours $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.

Output: one JSON line {"queries": {name: best_sec}, "sf": ..., ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="", help="comma list; empty = all")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--sink", choices=["count", "noop"], default="count")
    ap.add_argument("--plans", default="", help="dir for explain() captures")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--skip-warm", action="store_true",
                    help="skip the pages warmup (non-pages queries only)")
    args = ap.parse_args()

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import bench as benchmod
    import __spark_entry__ as entrymod
    from weak_supervision_for_ner_spark.config import get_spark

    spark = get_spark("wsner-bench-extra", cores=cores, shuffle_partitions=cores)
    spark.range(1000).selectExpr("sum(id)").collect()

    registry = dict(benchmod.query_registry(entrymod))
    wanted = [q for q in args.queries.split(",") if q] or list(registry)
    unknown = set(wanted) - set(registry)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    needs_pages = any(q in ("kg_pipeline_mv", "hmm_fit_decode",
                            "mentions_all_sources") for q in wanted)
    if needs_pages and not args.skip_warm:
        from weak_supervision_for_ner_spark.sources.pages import synth_pages

        pages_dir = "/tmp/wsner_bench_pages"
        n_docs = entrymod._n_docs(sf_dir)
        for nd in (entrymod._n_docs("/root/testdata/sf0.001"), n_docs):
            synth_pages(spark, nd).write.mode("overwrite").parquet(
                f"{pages_dir}/pages_sf_{nd}"
            )
        os.environ["SPARK_GRAFT_PAGES_DIR"] = pages_dir
        for warm_fn in (entrymod.q_pages_triples, entrymod.q_pages_hmm):
            try:
                warm_fn(spark, "/root/testdata/sf0.001").count()
            except Exception as exc:  # noqa: BLE001
                print(f"# warmup failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in wanted:
        fn = registry[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                df = fn(spark, sf_dir)
                txt = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(os.path.join(args.plans,
                                       f"{name}_{args.suffix}.txt"), "w") as fd:
                    fd.write(txt)
            except Exception as exc:  # noqa: BLE001
                print(f"# plan capture failed for {name}: {exc}", file=sys.stderr)
            spark.catalog.clearCache()
        times = []
        n = None
        for _ in range(args.runs):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
                n = -1
            else:
                n = df.count()
            times.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = min(times)
        print(f"# {name}: {n} rows, best {timings[name]}s of {times}",
              file=sys.stderr)

    print(json.dumps({
        "queries": timings, "sf_dir": sf_dir, "cores": cores,
        "sink": args.sink, "runs": args.runs,
        "load_1m_at_start": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
