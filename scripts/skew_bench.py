"""Skew-stress evidence (r4 verdict item 7): run the flagship KG
pipeline and the near-dup corpus filter on a SPREAD corpus vs an
adversarially SKEWED one and record the wall-time ratio. Both sides
of each comparison carry the IDENTICAL work content so the ratio
isolates skew handling:
- kg: 50% of docs are hot-domain boilerplate (128 templates) in both
  variants — interleaved through the id space vs concentrated in one
  contiguous block (whole input partitions all-boilerplate); the text
  multisets are identical (certified by identical triple counts).
- dedup: 50% of docs are near-dups in both variants — 50k 2-member
  clusters vs ONE 100k-member mega-cluster (same dup mass; a no-dup
  baseline would run zero CC rounds and overstate the ratio).
The claim under test: the salting / star-edge / bucket-cap /
exact-collapse designs keep skewed wall-time within ~1.3x — proven by
measurement, not by construction.

Each measurement runs in a fresh subprocess JVM at local[16] (the
scaling bench's protocol). Appends a section to BENCH_SCALING.md.

Usage: python scripts/skew_bench.py [n_docs_kg] [n_docs_dedup]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

KG_JOB = r"""
import os, sys, time, json
from weak_supervision_for_ner_spark.config import get_spark
from weak_supervision_for_ner_spark.sources.pages import synth_pages, synth_pages_hot_domain
from weak_supervision_for_ner_spark.plans.pipeline import run_kg_pipeline

cores, n_docs, variant = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark(f"skew-kg-{variant}", cores=cores, shuffle_partitions=cores)
spark.range(1000).selectExpr("sum(id)").collect()
wa, wm, wg = run_kg_pipeline(spark, synth_pages(spark, 200, partitions=cores))
wg.count(); wa.unpersist(); wm.unpersist()
# 'spread' and 'skewed' generate the IDENTICAL multiset of texts (50%
# hot-domain boilerplate templates either way); only the PLACEMENT
# differs — interleaved vs one contiguous all-boilerplate id block —
# so the ratio isolates data-placement skew from work content.
# 'uniform' (no dups at all) is kept selectable for context runs.
part_mult = int(os.environ.get("SPARK_GRAFT_SKEW_PART_MULT", "2"))
if variant == "uniform":
    pages = synth_pages(spark, n_docs, partitions=cores * part_mult)
else:
    placement = "interleaved" if variant == "spread" else "block"
    pages = synth_pages_hot_domain(
        spark, n_docs, partitions=cores * part_mult, placement=placement
    )
pages = pages.persist()
pages.count()
t0 = time.time()
annotated, mentions, graph = run_kg_pipeline(spark, pages, aggregator="majority")
n = graph.count()
dt = time.time() - t0
print(json.dumps({"variant": variant, "sec": round(dt, 3), "triples": n,
                  "docs_per_sec": round(n_docs / dt, 1)}))
"""

DEDUP_JOB = r"""
import sys, time, json
from pyspark.sql import functions as F
from weak_supervision_for_ner_spark.config import get_spark
from weak_supervision_for_ner_spark.operators.dedup import drop_near_duplicates

cores, n_docs, variant = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark(f"skew-dd-{variant}", cores=cores, shuffle_partitions=cores)
spark.range(1000).selectExpr("sum(id)").collect()

def corpus(variant):
    base = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # md5-scrambled tokens: a linear-congruential formula here creates
    # SHIFTED token sequences across docs (doc d and d+delta share 39
    # of 40 tokens), silently turning the "uniform" corpus into
    # near-dup chains — measured 200k docs collapsing to 35k survivors
    unique = F.expr(
        "concat_ws(' ', transform(sequence(1, 40), "
        "i -> concat('tok', substring(md5(concat(doc_id, '-', i)), 1, 7))))"
    )
    if variant == "uniform":
        return base.select("doc_id", unique.alias("text"))
    # 50% of docs are near-dups either way; what varies is the SHAPE:
    # 'spread' = 50k clusters of 2 (cluster key doc_id//4), 'skewed' =
    # ONE mega-cluster of 100k members sharing every LSH band. Same
    # clustering mass, so spread-vs-skewed isolates mega-bucket
    # handling from the cost of clustering itself. The per-doc mutated
    # token keeps them near- (not exact-) dups, so the exact
    # pre-collapse cannot hide the cluster from LSH.
    ckey = "0" if variant == "skewed" else "cast(doc_id / 4 as bigint)"
    shared = F.expr(
        "concat_ws(' ', transform(sequence(1, 40), "
        f"i -> concat('boiler', {ckey}, '_', i, "
        "CASE WHEN i = pmod(doc_id, 40) + 1 "
        "THEN concat('_', doc_id) ELSE '' END)))"
    )
    return base.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, shared).otherwise(unique).alias("text"),
    )

# warm identical shape
drop_near_duplicates(corpus("uniform").limit(500), n_hashes=4, bands=2, n=3).count()
docs = corpus(variant).persist()
docs.count()
t0 = time.time()
n = drop_near_duplicates(docs, n_hashes=4, bands=2, n=3).count()
dt = time.time() - t0
print(json.dumps({"variant": variant, "sec": round(dt, 3), "survivors": n}))
"""


CAP_JOB = r"""
import sys, time, json
from pyspark.sql import functions as F
from weak_supervision_for_ner_spark.config import get_spark
from weak_supervision_for_ner_spark.operators.textstats import cap_per_domain

cores, n_docs, variant = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
spark = get_spark(f"skew-cap-{variant}", cores=cores, shuffle_partitions=cores)
spark.range(1000).selectExpr("sum(id)").collect()
n_salts = 1 if variant == "single" else 16
# hot-domain corpus: HALF of all rows belong to ONE domain (the input
# cap_per_domain exists for), the rest spread over n_docs/200 domains.
# Same input for both variants - this is a plan A/B (unsalted
# single-window vs salted two-level top-k), not a placement A/B.
docs = spark.range(n_docs).select(
    F.col("id").alias("doc_id"),
    F.when(F.col("id") % 2 == 0, F.lit("hot.example.com"))
     .otherwise(F.concat(F.lit("d"), F.pmod(F.col("id"), F.lit(n_docs // 200))))
     .alias("source"),
    F.pmod(F.xxhash64(F.col("id")), F.lit(100000)).cast("int").alias("n_chars"),
).persist()
docs.count()
cap_per_domain(docs.limit(2000), k=100, n_salts=n_salts).count()  # warm
t0 = time.time()
n = cap_per_domain(docs, k=100, n_salts=n_salts).count()
dt = time.time() - t0
print(json.dumps({"variant": variant, "sec": round(dt, 3), "survivors": n}))
"""


def run(job: str, cores: int, n_docs: int, variant: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", job, str(cores), str(n_docs), variant],
        capture_output=True, text=True, check=True, cwd="/root/repo",
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def wait_idle(threshold: float = 4.0, max_wait: float = 240.0) -> float:
    while os.getloadavg()[0] >= threshold and max_wait > 0:
        time.sleep(10)
        max_wait -= 10
    return round(os.getloadavg()[0], 2)


def main() -> None:
    n_kg = int(sys.argv[1]) if len(sys.argv) > 1 else 192_000
    n_dd = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    cores = int(os.environ.get("SPARK_GRAFT_SKEW_CORES", "16"))
    load = wait_idle()
    results = {"cores": cores, "load_1m_before": load}
    # the dedup baseline is 'spread' (same 50% near-dup mass in 50k
    # 2-member clusters): spread-vs-mega-cluster isolates the skew
    # handling from the cost of clustering itself, which a no-dup
    # uniform baseline would conflate (uniform runs ZERO CC rounds)
    for name, job, n, base_variant in (
        ("kg", KG_JOB, n_kg, "spread"),
        ("dedup_drop_near", DEDUP_JOB, n_dd, "spread"),
    ):
        uni = run(job, cores, n, base_variant)
        skw = run(job, cores, n, "skewed")
        ratio = round(skw["sec"] / uni["sec"], 3)
        results[name] = {"n_docs": n, "baseline_variant": base_variant,
                         "baseline": uni, "skewed": skw, "skew_ratio": ratio}
        print(f"# {name}: {base_variant} {uni['sec']}s vs skewed {skw['sec']}s "
              f"-> ratio {ratio}", file=sys.stderr)
    # cap_per_domain (r5 verdict item #5): same mega-domain input, plan
    # A/B — the salted two-level top-k vs the unsalted single window
    # that funnels the hot domain through one task. Outputs must agree.
    n_cap = int(os.environ.get("SPARK_GRAFT_SKEW_CAP_DOCS", "4000000"))
    single = run(CAP_JOB, cores, n_cap, "single")
    salted = run(CAP_JOB, cores, n_cap, "salted")
    assert single["survivors"] == salted["survivors"], (single, salted)
    cap_ratio = round(single["sec"] / salted["sec"], 3)
    results["cap_per_domain"] = {
        "n_docs": n_cap, "single_window": single, "salted": salted,
        "single_over_salted": cap_ratio,
    }
    print(f"# cap_per_domain: single-window {single['sec']}s vs salted "
          f"{salted['sec']}s -> single/salted {cap_ratio}", file=sys.stderr)
    print(json.dumps({"metric": "skew_stress", **results}))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SCALING.md"), "a") as fd:
        kg, dd = results["kg"], results["dedup_drop_near"]
        fd.write(
            f"\n## Skew stress (local[{cores}], load {load})\n\n"
            f"| job | n_docs | baseline | skewed (50% hot) | ratio |\n"
            f"|---|---|---|---|---|\n"
            f"| kg_pipeline_mv | {kg['n_docs']} | {kg['baseline_variant']} "
            f"{kg['baseline']['sec']}s "
            f"| {kg['skewed']['sec']}s | {kg['skew_ratio']} |\n"
            f"| dedup_drop_near | {dd['n_docs']} | {dd['baseline_variant']} "
            f"{dd['baseline']['sec']}s "
            f"| {dd['skewed']['sec']}s | {dd['skew_ratio']} |\n"
        )
        cp = results["cap_per_domain"]
        fd.write(
            f"| cap_per_domain (plan A/B, 50% one domain) | {cp['n_docs']} "
            f"| salted {cp['salted']['sec']}s "
            f"| single-window {cp['single_window']['sec']}s "
            f"| single/salted {cp['single_over_salted']} |\n"
        )


if __name__ == "__main__":
    main()
