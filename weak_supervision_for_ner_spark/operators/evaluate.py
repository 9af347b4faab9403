"""Evaluation harness: token- and entity-level P/R/F1 vs a gold span
table, with micro/macro/weighted rollups.

Spark re-expression of the reference's metrics engine
(analysis.py:40-161): the per-document set algebra (TP = intersection,
FP/FN = differences) becomes inner + anti joins on
(url, start, end, label); token-level metrics explode spans into token
indices first; the three rollups are named re-aggregations of the
per-label counts (no cube needed). CONLL label mapping and the
conf >= 0.5 threshold follow analysis.py:6-8, 72.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from weak_supervision_for_ner_spark.schema import CONLL_MAPPINGS


def best_label_per_span(pred: DataFrame, conf_threshold: float = 0.5) -> DataFrame:
    """Highest-confidence label per (url, span) with threshold
    (analysis.py:65-73): max_by over the span group."""
    return (
        pred.groupBy("url", "start", "end")
        .agg(
            F.max_by("label", F.struct("conf", "label")).alias("label"),
            F.max("conf").alias("conf"),
        )
        .filter(F.col("conf") >= conf_threshold)
        .select("url", "start", "end", "label")
    )


def map_labels(df: DataFrame, mappings: dict[str, str] | None = None,
               keep: set[str] | None = None) -> DataFrame:
    mappings = CONLL_MAPPINGS if mappings is None else mappings
    expr = F.col("label")
    for src, dst in sorted(mappings.items()):
        expr = F.when(F.col("label") == src, dst).otherwise(expr)
    out = df.withColumn("label", expr)
    if keep is not None:
        out = out.filter(F.col("label").isin(sorted(keep)))
    return out


def _counts(gold: DataFrame, pred: DataFrame, keys: list[str]) -> DataFrame:
    """(label, tp, fp, fn, support) via one inner and two anti joins."""
    g = gold.select(*keys, "label").distinct()
    p = pred.select(*keys, "label").distinct()
    on = keys + ["label"]
    tp = g.join(p, on).groupBy("label").agg(F.count(F.lit(1)).alias("tp"))
    fp = p.join(g, on, "left_anti").groupBy("label").agg(F.count(F.lit(1)).alias("fp"))
    fn = g.join(p, on, "left_anti").groupBy("label").agg(F.count(F.lit(1)).alias("fn"))
    support = g.groupBy("label").agg(F.count(F.lit(1)).alias("support"))
    return (
        support.join(tp, "label", "left").join(fp, "label", "full")
        .join(fn, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            F.coalesce("fp", F.lit(0)).alias("fp"),
            F.coalesce("fn", F.lit(0)).alias("fn"),
            F.coalesce("support", F.lit(0)).alias("support"),
        )
    )


def _tokens(df: DataFrame) -> DataFrame:
    # end <= start would make F.sequence DESCEND (Spark auto-reverses
    # empty ranges), silently injecting wrong token indices — degenerate
    # spans contribute nothing instead
    return df.filter(F.col("end") > F.col("start")).select(
        "url", "label",
        F.explode(F.sequence(F.col("start"), F.col("end") - 1)).alias("idx"),
    )


def _biluo_tokens(df: DataFrame, with_conf: bool = False) -> DataFrame:
    """Explode spans to per-token BILUO-qualified labels
    (analysis.py:170-206): a unit span is U-label; longer spans emit
    B-label, I-label*, L-label."""
    cols = ["url", "start", "end", "label"] + (["conf"] if with_conf else [])
    # degenerate spans (end <= start) would explode a DESCENDING
    # sequence into wrong token indices — drop them instead
    tok = df.filter(F.col("end") > F.col("start")).select(
        *cols, F.explode(F.sequence(F.col("start"), F.col("end") - 1)).alias("idx")
    )
    tag = (
        F.when(F.col("end") == F.col("start") + 1, F.lit("U"))
        .when(F.col("idx") == F.col("start"), F.lit("B"))
        .when(F.col("idx") == F.col("end") - 1, F.lit("L"))
        .otherwise(F.lit("I"))
    )
    out = tok.withColumn("qlabel", F.concat_ws("-", tag, F.col("label")))
    keep = ["url", "idx", "qlabel"] + (["conf"] if with_conf else [])
    return out.select(*keep)


def token_logloss(
    gold: DataFrame,
    pred: DataFrame,
    doc_len: DataFrame | None = None,
    eps: float = 1e-15,
) -> DataFrame:
    """Token-level cross-entropy of predicted confidences vs gold BILUO
    one-hots — the reference's ``compute_logloss`` (analysis.py:165-210)
    re-expressed relationally, corpus-wide in one pass instead of one
    numpy matrix per document.

    Semantics preserved: per document the label space is
    ``O + {B,I,L,U} x sorted(gold labels of that doc)``; predicted spans
    whose label is absent from the doc's gold label set are skipped;
    the O column is ``1 - sum(other columns)``; probabilities are
    clipped to [eps, 1-eps] and row-renormalised before the log, exactly
    like the legacy ``sklearn.metrics.log_loss(normalize=False)`` the
    reference calls. Deviation (documented): when two predicted spans
    write the same (token, BILUO-label) cell the reference keeps the
    last dict-ordered value; we take the max conf, which is
    deterministic under parallel evaluation.

    Returns a single row: ``n_tokens, logloss_total (DECIMAL 28,9),
    logloss_per_token``. The per-token losses are summed as
    DECIMAL(20,9) so the total is exact and independent of partition
    order — safe for cross-engine hash comparison at any parallelism.
    """
    one_minus = 1.0 - eps

    def clip(c):
        return F.greatest(F.lit(eps), F.least(F.lit(one_minus), c))

    if doc_len is None:
        doc_len = gold.groupBy("url").agg(F.max("end").alias("n_tokens"))
    # zero/negative-length docs would explode a descending index range
    doc_len = doc_len.filter(F.col("n_tokens") > 0)
    dlab = gold.select("url", "label").distinct()
    nlab = dlab.groupBy("url").agg(F.count(F.lit(1)).alias("nlabels"))
    toks = doc_len.select(
        "url", F.explode(F.sequence(F.lit(0), F.col("n_tokens") - 1)).alias("idx")
    )
    gold_tok = _biluo_tokens(gold).withColumnRenamed("qlabel", "glabel")
    pred_in_space = pred.join(dlab, ["url", "label"], "left_semi")
    pred_tok = (
        _biluo_tokens(pred_in_space, with_conf=True)
        .groupBy("url", "idx", "qlabel")
        .agg(F.max("conf").alias("conf"))
    )
    rowstats = pred_tok.groupBy("url", "idx").agg(
        F.sum(clip(F.col("conf"))).alias("s_clip"),
        F.sum("conf").alias("s_raw"),
        F.count(F.lit(1)).alias("nnz"),
    )
    tok = (
        toks.join(gold_tok, ["url", "idx"], "left")
        .join(rowstats, ["url", "idx"], "left")
        .join(
            pred_tok.withColumnRenamed("qlabel", "glabel").withColumnRenamed("conf", "pconf"),
            ["url", "idx", "glabel"],
            "left",
        )
        .join(nlab, ["url"], "left")
    )
    o_raw = F.lit(1.0) - F.coalesce(F.col("s_raw"), F.lit(0.0))
    numer = clip(
        F.when(F.col("glabel").isNull(), o_raw).otherwise(
            F.coalesce(F.col("pconf"), F.lit(0.0))
        )
    )
    denom = (
        F.coalesce(F.col("s_clip"), F.lit(0.0))
        + clip(o_raw)
        + (
            4 * F.coalesce(F.col("nlabels"), F.lit(0))
            - F.coalesce(F.col("nnz"), F.lit(0))
        )
        * F.lit(eps)
    )
    loss = tok.select((-F.log(numer / denom)).alias("l"))
    return loss.agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("l").cast("decimal(20,9)"))
        .cast("decimal(28,9)")
        .alias("logloss_total"),
    ).select(
        "n_tokens",
        F.col("logloss_total").cast("double").alias("logloss_total"),
        (F.col("logloss_total").cast("double") / F.col("n_tokens")).alias(
            "logloss_per_token"
        ),
    )


def evaluate_mentions(
    gold: DataFrame, pred: DataFrame, conf_threshold: float = 0.5,
    mappings: dict[str, str] | None = None, keep: set[str] | None = None,
) -> DataFrame:
    """Per-label + micro/macro/weighted metrics table.

    Columns: label, entity_precision/recall/f1, token_precision/
    recall/f1, support (per-label rows carry entity support)."""
    pred_best = best_label_per_span(pred, conf_threshold)
    if mappings is not None or keep is not None:
        pred_best = map_labels(pred_best, mappings or {}, keep)
        gold = map_labels(gold, mappings or {}, keep)
    # Both count tables feed several downstream aggregations/collects;
    # persist so the upstream (possibly a full UDF pipeline) runs once.
    pred_best = pred_best.persist()
    gold = gold.persist()

    ent = _counts(gold, pred_best, ["url", "start", "end"]).persist()
    tok = _counts(_tokens(gold), _tokens(pred_best), ["url", "idx"]).persist()

    def prf(df: DataFrame, prefix: str) -> DataFrame:
        eps = 1e-10
        p = F.round(F.col("tp") / (F.col("tp") + F.col("fp") + eps), 6)
        r = F.round(F.col("tp") / (F.col("tp") + F.col("fn") + eps), 6)
        return df.select(
            "label", "support",
            p.alias(f"{prefix}_precision"), r.alias(f"{prefix}_recall"),
        ).withColumn(
            f"{prefix}_f1",
            F.round(
                2 * F.col(f"{prefix}_precision") * F.col(f"{prefix}_recall")
                / (F.col(f"{prefix}_precision") + F.col(f"{prefix}_recall") + 1e-10),
                6,
            ),
        )

    per_label = (
        prf(ent, "entity")
        .join(prf(tok, "token").drop("support"), "label", "full")
        .na.fill(0.0)
    )

    # micro: re-aggregate raw counts; macro: average per-label metrics;
    # weighted: support-share dot product (analysis.py:124-158)
    def rollup(ent_c: DataFrame, tok_c: DataFrame) -> list:
        e = ent_c.agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"),
            F.sum("fn").alias("fn"), F.sum("support").alias("support"),
        ).collect()[0]
        t = tok_c.agg(
            F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn"),
        ).collect()[0]
        rows = []
        eps = 1e-10

        def prf3(tp, fp, fn):
            p = round(tp / (tp + fp + eps), 6)
            r = round(tp / (tp + fn + eps), 6)
            return p, r, round(2 * p * r / (p + r + eps), 6)

        ep, er, ef = prf3(e["tp"], e["fp"], e["fn"])
        tpk, trk, tfk = prf3(t["tp"], t["fp"], t["fn"])
        rows.append(("micro", int(e["support"]), ep, er, ef, tpk, trk, tfk))
        return rows

    micro = rollup(ent, tok)
    macro_weighted = (
        per_label.agg(
            F.round(F.avg("entity_precision"), 6), F.round(F.avg("entity_recall"), 6),
            F.round(F.avg("token_precision"), 6), F.round(F.avg("token_recall"), 6),
            F.round(
                F.sum(F.col("entity_precision") * F.col("support")) / F.sum("support"), 6
            ),
            F.round(
                F.sum(F.col("entity_recall") * F.col("support")) / F.sum("support"), 6
            ),
            F.sum("support"),
        ).collect()[0]
    )

    def f1(p, r):
        return round(2 * p * r / (p + r + 1e-10), 6)

    extra = [
        ("macro", int(macro_weighted[6]),
         macro_weighted[0], macro_weighted[1], f1(macro_weighted[0], macro_weighted[1]),
         macro_weighted[2], macro_weighted[3], f1(macro_weighted[2], macro_weighted[3])),
        ("weighted", int(macro_weighted[6]),
         macro_weighted[4], macro_weighted[5], f1(macro_weighted[4], macro_weighted[5]),
         0.0, 0.0, 0.0),
    ]
    spark = gold.sparkSession
    extra_df = spark.createDataFrame(
        micro + extra,
        schema=(
            "label string, support long, entity_precision double, entity_recall double,"
            " entity_f1 double, token_precision double, token_recall double, token_f1 double"
        ),
    )
    return per_label.select(
        "label", "support", "entity_precision", "entity_recall", "entity_f1",
        "token_precision", "token_recall", "token_f1",
    ).unionByName(extra_df)
