"""Evaluation: truth-space table and pairwise cluster F1.

Reference semantics (/root/reference/splink/internals/accuracy.py:26-293):
- labels joined to predictions on ordered (unique_id_l, unique_id_r);
  labeled pairs the blocking never scored get match_weight -999 (never
  predicted positive at any real threshold, accuracy.py:89-105).
- for every distinct threshold (descending): cumulative TP/FP/FN/TN,
  precision = TP/(TP+FP), recall = TP/P, F1 = 2TP/(2TP+FN+FP).

The threshold sweep is a window cumulative sum over the distinct weights —
one shuffle, no per-threshold rescan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MISSING_WEIGHT = -999.0


def labels_with_predictions(labels: DataFrame, predictions: DataFrame
                            ) -> DataFrame:
    """(unique_id_l, unique_id_r, clerical_match_score) left-joined to
    predicted match weights (ordered pairs on both sides)."""
    lab = labels.select(
        F.least("unique_id_l", "unique_id_r").alias("unique_id_l"),
        F.greatest("unique_id_l", "unique_id_r").alias("unique_id_r"),
        F.col("clerical_match_score").cast("double").alias("clerical_match_score"),
    )
    pred = predictions.select(
        F.least("unique_id_l", "unique_id_r").alias("unique_id_l"),
        F.greatest("unique_id_l", "unique_id_r").alias("unique_id_r"),
        "match_weight", "match_probability",
    )
    return lab.join(pred, on=["unique_id_l", "unique_id_r"], how="left") \
        .withColumn("match_weight",
                    F.coalesce("match_weight", F.lit(MISSING_WEIGHT))) \
        .withColumn("match_probability",
                    F.coalesce("match_probability", F.lit(0.0)))


def truth_space_table(labels: DataFrame, predictions: DataFrame,
                      positive_threshold: float = 0.5) -> DataFrame:
    """One row per distinct predicted match_weight, with cumulative
    TP/FP/FN/TN and P/R/F1 when thresholding at that weight."""
    lp = labels_with_predictions(labels, predictions).select(
        "match_weight",
        (F.col("clerical_match_score") >= positive_threshold)
        .cast("int").alias("is_pos"),
    )
    per_t = lp.groupBy("match_weight").agg(
        F.sum("is_pos").alias("pos_at_t"),
        F.sum(1 - F.col("is_pos")).alias("neg_at_t"),
    )
    w = Window.orderBy(F.desc("match_weight")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = lp.agg(
        F.sum("is_pos").alias("P"), F.sum(1 - F.col("is_pos")).alias("N")
    ).collect()[0]
    total_p, total_n = float(totals["P"] or 0), float(totals["N"] or 0)
    out = per_t.select(
        F.col("match_weight").alias("truth_threshold"),
        F.sum("pos_at_t").over(w).cast("double").alias("tp"),
        F.sum("neg_at_t").over(w).cast("double").alias("fp"),
    ).withColumn("fn", F.lit(total_p) - F.col("tp")) \
     .withColumn("tn", F.lit(total_n) - F.col("fp"))
    return out.select(
        "truth_threshold", "tp", "fp", "fn", "tn",
        (F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1.0)))
        .alias("precision"),
        (F.col("tp") / F.lit(max(total_p, 1.0))).alias("recall"),
        (2 * F.col("tp")
         / F.greatest(2 * F.col("tp") + F.col("fn") + F.col("fp"), F.lit(1.0)))
        .alias("f1"),
    )


def truth_space_from_labels_with_predictions(
        lp: DataFrame, total_labels: float,
        threshold_actual: float = 0.5,
        positives_not_captured_by_blocking_rules_scored_as_zero: bool = True,
) -> DataFrame:
    """Truth space from a labels-COLUMN prediction table (reference
    accuracy.py:26-293,337-404). `lp` carries (match_weight,
    clerical_match_score, found_by_blocking_rules); pairs not found by the
    model's own blocking rules (only by the added label-column rule) are
    scored at -999, and the pairs never generated at all are implicit
    ("ghost") true negatives accounted for through `total_labels` (the
    cartesian label count, C(n,2) for dedupe).

    One groupBy over distinct weights + two cumulative windows — no
    per-threshold rescan. Output matches truth_space_table's shape."""
    tt = F.col("match_weight")
    if positives_not_captured_by_blocking_rules_scored_as_zero:
        tt = F.when(F.col("found_by_blocking_rules"), tt) \
            .otherwise(F.lit(MISSING_WEIGHT))
    base = lp.select(
        tt.alias("truth_threshold"),
        (F.coalesce(F.col("clerical_match_score"), F.lit(0.0))
         >= threshold_actual).cast("int").alias("is_pos"),
    )
    per = base.groupBy("truth_threshold").agg(
        F.sum("is_pos").alias("pos_at_t"),
        F.sum(1 - F.col("is_pos")).alias("neg_at_t"),
        F.count(F.lit(1)).alias("n_at_t"),
    )
    totals = base.agg(
        F.sum("is_pos").alias("P"), F.sum(1 - F.col("is_pos")).alias("Nf"),
    ).collect()[0]
    total_p = float(totals["P"] or 0)
    w_desc = Window.orderBy(F.desc("truth_threshold")) \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_asc = Window.orderBy("truth_threshold") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ghosts = float(total_labels) - total_p - float(totals["Nf"] or 0)
    out = per.select(
        "truth_threshold",
        F.sum("pos_at_t").over(w_desc).cast("double").alias("tp"),
        (F.sum("n_at_t").over(w_desc) - F.sum("pos_at_t").over(w_desc))
        .cast("double").alias("fp"),
        # FN = positives strictly below t (ghost negatives cancel out)
        (F.sum("n_at_t").over(w_asc) - F.col("n_at_t")
         - (F.sum("neg_at_t").over(w_asc) - F.col("neg_at_t")))
        .cast("double").alias("fn"),
        (F.sum("neg_at_t").over(w_asc) - F.col("neg_at_t") + F.lit(ghosts))
        .cast("double").alias("tn"),
    ).where(F.col("truth_threshold") >= -998.0)
    return out.select(
        "truth_threshold", "tp", "fp", "fn", "tn",
        F.when(F.col("tp") + F.col("fp") == 0, F.lit(1.0))
        .otherwise(F.col("tp") / (F.col("tp") + F.col("fp")))
        .alias("precision"),
        (F.col("tp") / F.lit(max(total_p, 1.0))).alias("recall"),
        (2 * F.col("tp")
         / F.greatest(2 * F.col("tp") + F.col("fn") + F.col("fp"), F.lit(1.0)))
        .alias("f1"),
    )


def pairwise_cluster_f1(membership: DataFrame, pred_col: str = "cluster_id",
                        truth_col: str = "cluster") -> dict[str, float]:
    """Pairwise precision/recall/F1 of a predicted clustering vs ground
    truth, computed entirely with aggregations (no pair materialization):
    TP = sum over (pred, truth) cells of C(n,2); P/T likewise."""
    def _pairs(df: DataFrame, cols: list[str]) -> float:
        return float(
            df.groupBy(*cols).count()
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("v"))
            .collect()[0]["v"] or 0.0
        )

    tp = _pairs(membership, [pred_col, truth_col])
    p = _pairs(membership, [pred_col])
    t = _pairs(membership, [truth_col])
    precision = tp / p if p else 1.0
    recall = tp / t if t else 1.0
    f1 = 2 * tp / (p + t) if (p + t) else 1.0
    return {"precision": precision, "recall": recall, "f1": f1,
            "tp_pairs": tp, "pred_pairs": p, "truth_pairs": t}


def prediction_errors(labels: DataFrame, predictions: DataFrame,
                      threshold_weight: float,
                      positive_threshold: float = 0.5) -> DataFrame:
    """FP/FN lists at one threshold (accuracy.py:447-560)."""
    lp = labels_with_predictions(labels, predictions)
    pred_pos = F.col("match_weight") >= threshold_weight
    is_pos = F.col("clerical_match_score") >= positive_threshold
    return lp.withColumn(
        "error_type",
        F.when(pred_pos & ~is_pos, F.lit("FP"))
         .when(~pred_pos & is_pos, F.lit("FN")),
    ).where(F.col("error_type").isNotNull())


ACCURACY_METRICS = ("specificity", "npv", "accuracy", "f1", "f2", "f0_5",
                    "p4", "phi")


def add_accuracy_metrics(truth_space: DataFrame,
                         add_metrics: list[str] | None = None) -> DataFrame:
    """Extend a truth-space frame (truth_threshold, tp, fp, fn, tn,
    precision, recall, ...) with the reference's optional accuracy metrics
    (reference accuracy.py:254-283 `truth_space_table_from_labels_*` final
    SELECT): specificity TN/N, npv TN/(TN+FN) (1 when the denominator is
    0), accuracy (TP+TN)/(P+N), F-beta for beta in {1, 2, 0.5}, P4, and
    the phi / Matthews correlation coefficient (0 on any degenerate
    margin). Pure Column expressions over already-computed counts — no
    extra pass over the labels."""
    metrics = list(add_metrics) if add_metrics is not None \
        else list(ACCURACY_METRICS)
    bad = [m for m in metrics if m not in ACCURACY_METRICS]
    if bad:
        raise ValueError(
            f"invalid metrics {bad}; allowed: {', '.join(ACCURACY_METRICS)}")
    tp, fp = F.col("tp"), F.col("fp")
    fn, tn = F.col("fn"), F.col("tn")
    p, n = tp + fn, tn + fp
    exprs = {
        "specificity": tn / n,
        "npv": F.when(tn + fn == 0, F.lit(1.0)).otherwise(tn / (tn + fn)),
        "accuracy": (tp + tn) / (p + n),
        "f1": 2.0 * tp / (2 * tp + fn + fp),
        "f2": 5.0 * tp / (5 * tp + 4 * fn + fp),
        "f0_5": 1.25 * tp / (1.25 * tp + 0.25 * fn + fp),
        # reference leaves the all-zero denominator (perfect classifier on
        # a one-class margin) as 0/0; define it as 0 so the value is stable
        "p4": F.when(
            (4.0 * tp * tn) + ((tp + tn) * (fp + fn)) == 0, F.lit(0.0)
        ).otherwise(
            4.0 * tp * tn / ((4.0 * tp * tn) + ((tp + tn) * (fp + fn)))),
        "phi": F.when(
            (tn + fn == 0) | (tp + fp == 0) | (p == 0) | (n == 0), F.lit(0.0)
        ).otherwise(
            (tp * tn - fp * fn) / F.sqrt((tp + fp) * p * n * (tn + fn))),
    }
    out = truth_space
    for m in metrics:
        out = out.withColumn(m, exprs[m].cast("double"))
    return out
