"""Controlled idle re-measurement of named bench queries, with a
committed JSON artifact — the tool the r4/r5 ad-hoc re-measurements
("ann_brute_jvm 4.77s idle, best-of-4") should have been: every number
it produces lands in bench_runs/<out>.json, so no measurement has to
live in BASELINE.md prose (r5 verdict items #2/#3).

Usage:
  python scripts/idle_bench.py OUT.json QUERY [QUERY ...]
Env (same knobs as bench.py):
  SPARK_GRAFT_CPUS (32), SPARK_GRAFT_SF_DIR (/root/testdata/sf0.1),
  SPARK_GRAFT_BENCH_RUNS (4), SPARK_GRAFT_BENCH_LOAD_MAX (2.0),
  SPARK_GRAFT_BENCH_WAIT_S (600)

Protocol: wait for the 1-minute load to drop below the threshold
(default 2.0 — tighter than bench.py's sweep, this tool exists for
CONTROLLED numbers), warm the session exactly like bench.py, then run
each query best-of-N with the pre-query load re-gated and recorded per
run. The artifact stores every run time and every load sample.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (the shared registry + idle-wait protocol)


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: idle_bench.py OUT.json QUERY [QUERY ...]")
    out_path, wanted = sys.argv[1], sys.argv[2:]

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "4"))
    load_max = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_MAX", "2.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT_S", "600"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from weak_supervision_for_ner_spark.config import get_spark
    from weak_supervision_for_ner_spark.sources.pages import synth_pages

    registry = dict(bench.query_registry(entrymod))
    unknown = [q for q in wanted if q not in registry]
    if unknown:
        sys.exit(f"unknown queries {unknown}; known: {sorted(registry)}")

    spark = get_spark("wsner-idle-bench", cores=cores,
                      shuffle_partitions=cores)
    spark.range(1000).selectExpr("sum(id)").collect()
    # same stored-corpus setup as bench.py main()
    pages_dir = "/tmp/wsner_bench_pages"
    n_docs = entrymod._n_docs(sf_dir)
    synth_pages(spark, n_docs).write.mode("overwrite").parquet(
        f"{pages_dir}/pages_sf_{n_docs}")
    os.environ["SPARK_GRAFT_PAGES_DIR"] = pages_dir

    results: dict[str, dict] = {}
    for name in wanted:
        fn = registry[name]
        # warm this query's codegen/python-worker path once, unmeasured
        fn(spark, sf_dir).count()
        runs, run_loads = [], []
        for _ in range(n_runs):
            load = bench._wait_for_idle(load_max, max_wait, 10,
                                        f"idle run of {name}")
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            runs.append(round(time.time() - t0, 3))
            run_loads.append(load)
        results[name] = {
            "best": min(runs), "runs": runs, "loads": run_loads, "rows": n,
        }
        print(f"# {name}: best {min(runs)}s of {runs} (loads {run_loads})",
              file=sys.stderr)

    artifact = {
        "tool": "scripts/idle_bench.py",
        "protocol": f"warm + best-of-{n_runs}, per-run idle-gate<{load_max:g}",
        "sf_dir": sf_dir, "cores": cores,
        "timestamp_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "queries": results,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as fd:
        json.dump(artifact, fd, indent=1)
    print(json.dumps({k: v["best"] for k, v in results.items()}))
    print(f"# wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
