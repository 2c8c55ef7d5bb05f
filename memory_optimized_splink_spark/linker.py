"""SparkLinker: the user-facing pipeline (reference: splink.Linker).

Wires nodes -> TF -> blocking -> comparison vectors -> predict -> clusters
through the checkpoint registry, so every stage is resumable and logged
(north rule). Entry points mirror the reference's linker components:
inference.predict (linker_components/inference.py:177-605), clustering
(linker_components/clustering.py:43-181), training
(linker_components/training.py), realtime find_matches_to_new_records /
compare_two_records (inference.py:770-1118).
"""

from __future__ import annotations

import math
from dataclasses import replace

from pyspark.sql import DataFrame, SparkSession, functions as F

from .accuracy import pairwise_cluster_f1, truth_space_table
from .model import Settings, prob_to_bayes_factor
from .operators.blocking import block_using_rules
from .operators.cluster import solve_connected_components
from .operators.nodes import join_tf_columns
from .operators.score import predict as predict_op
from .operators.vectors import compute_comparison_vectors
from .plans.checkpoint import CheckpointRegistry
from .plans.metrics import MetricsLog
from . import train as train_mod


class SparkLinker:
    def __init__(
        self,
        spark: SparkSession,
        input_table: DataFrame,
        settings: Settings,
        checkpoint_dir: str | None = None,
        enable_checkpoints: bool = False,
    ):
        self.spark = spark
        # custom levels (incl. imported reference settings) may call the
        # comparator UDFs by SQL name, mirroring the reference's JAR
        # registration (spark/database_api.py:166-190); idempotent
        from .functions.similarity import register_udfs
        register_udfs(spark)
        self.settings = settings.with_defaults()
        # fail fast on missing columns (reference linker.py:316-334)
        self.settings.validate_against(input_table.columns)
        self._input = input_table
        self.metrics = MetricsLog(
            f"{checkpoint_dir}/lineage.jsonl" if checkpoint_dir else None
        )
        self.registry = CheckpointRegistry(
            spark, checkpoint_dir or "/tmp/mos_spark_ckpt", metrics=self.metrics,
            enabled=enable_checkpoints,
        )
        self._nodes: DataFrame | None = None
        self._tf_tables: dict[str, DataFrame] = {}
        self._input_fp: dict | None = None
        self._n_records_cache: dict | None = None
        # (description, Settings snapshot) per estimation session, for
        # parameter_estimate_comparisons_chart (reference settings.py:581)
        self._parameter_estimates: list[tuple[str, object]] = []

    # ------------------------------------------------------------- stages
    def _input_identity(self) -> dict | None:
        """Fingerprint of the INPUT DATA for checkpoint keys: schema +
        row count + a content hash of the unique-id column. Without this,
        rerunning with a different --input but identical settings would
        silently resume the previous input's cached stages."""
        if not self.registry.enabled:
            return None
        if self._input_fp is None:
            schema = [f"{f.name}:{f.dataType.simpleString()}"
                      for f in self._input.schema.fields]
            uid = self.settings.unique_id_column_name
            aggs = [F.count(F.lit(1)).alias("n")]
            if uid in self._input.columns:
                aggs.append(F.coalesce(
                    F.expr(f"bit_xor(xxhash64({uid}))"), F.lit(0)).alias("h"))
            row = self._input.agg(*aggs).collect()[0]
            self._input_fp = {"schema": schema, "n": row["n"],
                              "h": row["h"] if uid in self._input.columns else None}
        return self._input_fp

    def _config(self, **extra) -> dict:
        return {"settings": self.settings.to_json(),
                "input": self._input_identity(), **extra}

    def nodes(self) -> DataFrame:
        if self._nodes is None:
            def build():
                from .operators.vectors import ensure_phonetic_columns

                df, tf = join_tf_columns(self._input, self.settings)
                # phonetic keys are encoded ONCE here (distinct values ->
                # join back), so the pair-scoring plan has no Python stage
                # from phonetic levels
                df = ensure_phonetic_columns(df, self.settings)
                self._tf_tables = tf
                return df
            self._nodes = self.registry.stage("nodes", self._config(), build)
        return self._nodes

    def blocked_pairs(self) -> DataFrame:
        nodes = self.nodes()
        pairs = self.registry.stage(
            "blocked_pairs", self._config(),
            lambda: block_using_rules(nodes, self.settings),
        )
        return pairs

    def comparison_vectors(self) -> DataFrame:
        nodes = self.nodes()
        pairs = self.blocked_pairs()
        if pairs.isEmpty():  # zero-pairs guard (inference.py:281-291)
            raise ValueError("blocking produced 0 candidate pairs")
        return self.registry.stage(
            "comparison_vectors", self._config(),
            lambda: compute_comparison_vectors(pairs, nodes, self.settings),
        )

    def predict(
        self,
        threshold_match_probability: float | None = None,
        threshold_match_weight: float | None = None,
    ) -> DataFrame:
        cv = self.comparison_vectors()
        n_records = self._n_records()

        def build():
            cv2 = cv
            if self.settings.tf_array_columns:
                cv2 = self._with_tf_array_adjustments(
                    cv, float(n_records["__total__"]))
            return predict_op(
                cv2, self.settings, n_records=n_records,
                threshold_match_probability=threshold_match_probability,
                threshold_match_weight=threshold_match_weight,
            )

        return self.registry.stage(
            "predict",
            self._config(tp=threshold_match_probability,
                         tw=threshold_match_weight),
            build,
        )

    def _with_tf_array_adjustments(self, cv: DataFrame, n_records: float
                                   ) -> DataFrame:
        """Fork's array-column TF adjustment (inference.py:335-550): for each
        configured array column with a matching comparison, join the
        intersect-term TF adjustment onto the pair table."""
        from .operators.nodes import compute_tf_table
        from .operators.tf_array import (
            apply_tf_array_adjustments, tf_array_adjustment,
        )

        # re-fetch pair columns for the array cols (cv carries only gammas)
        pairs = cv.select(*[c for c in cv.columns])
        nodes = self.nodes()
        adjustments = {}
        for col in self.settings.tf_array_columns:
            comp = next((c for c in self.settings.comparisons
                         if (c.column == col)), None)
            if comp is None:
                continue
            gamma_levels = [g for g, lv in comp.graded_levels
                            if lv.kind != "else"]
            tf = compute_tf_table(nodes, col, is_array=True)
            side = lambda s: nodes.select(
                F.col(self.settings.unique_id_column_name)
                .alias(f"unique_id{s}"), F.col(col).alias(f"{col}{s}"))
            pw = pairs.join(side("_l"), on="unique_id_l") \
                      .join(side("_r"), on="unique_id_r")
            adjustments[col] = tf_array_adjustment(
                pw, tf, col, comp.gamma_column, gamma_levels,
                n_records=n_records)
        return apply_tf_array_adjustments(cv, adjustments)

    def cluster(self, threshold_match_probability: float,
                with_md5_ids: bool = False) -> DataFrame:
        nodes = self.nodes()
        pred = self.predict()
        uid = self.settings.unique_id_column_name

        def build():
            edges = pred.where(
                F.col("match_probability") >= threshold_match_probability
            ).select("unique_id_l", "unique_id_r")
            member = solve_connected_components(
                nodes, edges, node_col=uid, with_md5_ids=with_md5_ids
            )
            return nodes.join(
                member.withColumnRenamed("node_id", uid), on=uid
            )

        return self.registry.stage(
            "clusters", self._config(t=threshold_match_probability,
                                     md5=with_md5_ids), build,
        )

    # ------------------------------------------------------------ training
    def estimate_u(self, max_pairs: float = 1e6) -> "SparkLinker":
        self.settings = train_mod.estimate_u_using_random_sampling(
            self.nodes(), self.settings, max_pairs=max_pairs
        )
        self._parameter_estimates.append(
            ("u from random sampling", self.settings))
        return self

    def estimate_lambda(self, deterministic_rules: list, recall: float
                        ) -> "SparkLinker":
        """probability_two_random_records_match from deterministic rules
        (linker_components/training.py:34-158)."""
        from dataclasses import replace

        lam = train_mod.estimate_probability_two_random_records_match(
            self.nodes(), self.settings, deterministic_rules, recall)
        self.settings = replace(
            self.settings, probability_two_random_records_match=lam)
        return self

    def estimate_m_from_label_column(self, label_column: str) -> "SparkLinker":
        """m from a ground-truth label column
        (linker_components/training.py:353)."""
        self.settings = train_mod.estimate_m_from_label_column(
            self.nodes(), self.settings, label_column)
        self._parameter_estimates.append(
            (f"m from label column {label_column}", self.settings))
        return self

    def count_comparisons(self, rule) -> int:
        """Comparison count a blocking rule would generate
        (blocking_analysis.count_comparisons_from_blocking_rule)."""
        from .operators.brs import count_comparisons_for_keys

        return count_comparisons_for_keys(self.nodes(), tuple(rule.keys))

    def estimate_m_with_em(self, training_rule, fix_u: bool = True
                           ) -> list[dict]:
        self.settings, history = train_mod.estimate_parameters_using_em(
            self.nodes(), self.settings, training_rule, fix_u=fix_u
        )
        for h in history:
            self.metrics.log(stage="em", **h)
        rule_desc = "-".join(getattr(training_rule, "keys", ())) or "rule"
        self._parameter_estimates.append(
            (f"m from EM blocked on {rule_desc}", self.settings))
        return history

    def _n_records(self) -> dict | None:
        """Per-field non-null counts (the fork's `total_records_in_field`,
        comparison_level.py:30-42) + "__total__". Shared by batch predict()
        and the realtime entry points so TF-adjusted weights are identical
        in both paths (a scalar total diverges whenever a TF column has
        nulls)."""
        tf_cols = {
            (lv.column or c.column)
            for c in self.settings.comparisons
            for lv in c.levels if lv.tf_adjustment
        }
        if not (self.settings.tf_array_columns or tf_cols):
            return None
        if self._n_records_cache is None:
            from .operators.nodes import non_null_counts
            self._n_records_cache = non_null_counts(
                self.nodes(), sorted(tf_cols), include_total=True)
        return self._n_records_cache

    def _ensure_tf_tables(self) -> dict:
        """TF dims must come from the FULL node table (term_frequencies.py
        semantics), not from whatever small frame is being scored — rebuild
        them if the nodes stage was resumed from checkpoint."""
        if self.settings.tf_columns and not self._tf_tables:
            from .operators.nodes import compute_tf_table
            base = self._input
            self._tf_tables = {
                col: compute_tf_table(base, col)
                for col in self.settings.tf_columns
            }
        return self._tf_tables

    # ------------------------------------------------------------ realtime
    def find_matches_to_new_records(self, new_records: DataFrame,
                                    threshold_match_probability: float = 0.0
                                    ) -> DataFrame:
        """Score new records against the existing node table
        (inference.py:770-926): same blocking rules, cross-dataset only."""
        uid = self.settings.unique_id_column_name
        nodes = self.nodes()
        new_nodes, _ = join_tf_columns(new_records, self.settings,
                                       self._ensure_tf_tables() or None)
        marked = nodes.withColumn("_ds", F.lit(0)).unionByName(
            new_nodes.select(nodes.columns).withColumn("_ds", F.lit(1)),
            allowMissingColumns=True,
        )
        s = replace(self.settings,
                    additional_columns_to_retain=tuple(
                        set(self.settings.additional_columns_to_retain) | {"_ds"}))
        pairs = block_using_rules(marked, s)
        cv = compute_comparison_vectors(pairs, marked, s)
        cv = cv.where(F.col("_ds_l") + F.col("_ds_r") == 1).drop("_ds_l", "_ds_r")
        return predict_op(
            cv, self.settings,
            n_records=self._n_records(),
            threshold_match_probability=threshold_match_probability,
        )

    def compare_two_records_fast(self, rec_l: dict, rec_r: dict) -> dict:
        """Single-pair scoring WITHOUT a Spark job (reference realtime.py
        caches compiled SQL; here the trained model — settings, m/u, TF
        count maps — is collected ONCE and later calls are pure
        Python/numpy, microseconds instead of a job). Returns
        {gamma_*, match_weight, match_probability}; numbers match the batch
        predict (parity-tested). Raises LocalScoringUnsupported for
        custom-SQL levels or oversized TF dims — fall back to
        compare_two_records then."""
        # cache is keyed on the settings OBJECT: training reassigns
        # self.settings (frozen dataclass), which must invalidate the
        # scorer — otherwise fast scores silently keep pre-training m/u
        if getattr(self, "_local_scorer", None) is None or \
                getattr(self, "_local_scorer_settings", None) \
                is not self.settings:
            from .realtime import (
                LocalScorer, LocalScoringUnsupported, collect_tf_maps,
            )

            if self.settings.tf_array_columns:
                # array-TF adjustments join per-term TF grids — not
                # replicated driver-side; silently diverging from batch
                # predict would be worse than refusing
                raise LocalScoringUnsupported(
                    "tf_array_columns adjustments are not supported by the "
                    "local scorer; use compare_two_records")
            tf_maps = collect_tf_maps(self._ensure_tf_tables()) \
                if self.settings.tf_columns else None
            self._local_scorer = LocalScorer(
                self.settings, tf_maps=tf_maps, n_records=self._n_records())
            self._local_scorer_settings = self.settings
        return self._local_scorer.score(rec_l, rec_r)

    def compare_two_records(self, rec_l: dict, rec_r: dict) -> DataFrame:
        """Single-pair scoring (inference.py:928-1118)."""
        uid = self.settings.unique_id_column_name
        schema_cols = [c for c in self._input.columns]
        l = {**{c: None for c in schema_cols}, **rec_l, uid: "l"}
        r = {**{c: None for c in schema_cols}, **rec_r, uid: "r"}
        two = self.spark.createDataFrame([l, r], self._input.schema)
        two, _ = join_tf_columns(two, self.settings,
                                 self._ensure_tf_tables() or None)
        pairs = self.spark.createDataFrame(
            [("0", "l", "r")], "match_key string, unique_id_l string, unique_id_r string"
        )
        cv = compute_comparison_vectors(pairs, two, self.settings)
        return predict_op(cv, self.settings, n_records=self._n_records())

    def unlinkables(self) -> DataFrame:
        """Self-link score distribution (linker.py:505-564 / unlinkables.py):
        every record scored against itself; cum share per weight shows which
        records can never clear a threshold."""
        from .operators.cluster_extras import unlinkables_data

        uid = self.settings.unique_id_column_name
        nodes = self.nodes()
        pairs = nodes.select(
            F.lit("0").alias("match_key"),
            F.col(uid).alias("unique_id_l"),
            F.col(uid).alias("unique_id_r"),
        )
        cv = compute_comparison_vectors(pairs, nodes, self.settings)
        self_pred = predict_op(cv, self.settings, n_records=self._n_records())
        return unlinkables_data(self_pred)

    # -------------------------------------------------------- chart data
    def match_weights_chart_data(self) -> list[dict]:
        from .charts import match_weights_chart_data
        return match_weights_chart_data(self.settings)

    def m_u_parameters_chart_data(self) -> list[dict]:
        from .charts import m_u_parameters_chart_data
        return m_u_parameters_chart_data(self.settings)

    def waterfall_chart_data(self, limit: int = 10) -> list[list[dict]]:
        """Per-pair Bayes-factor decomposition records
        (waterfall_chart.py:141-155) for the top-weight predicted pairs."""
        from .charts import waterfall_chart_data

        cv = self.comparison_vectors()
        pred = predict_op(cv, self.settings, n_records=self._n_records(),
                          keep_bf_columns=True)
        rows = [r.asDict() for r in
                pred.orderBy(F.desc("match_weight")).limit(limit).collect()]
        return waterfall_chart_data(rows, self.settings)

    def match_weights_chart(self) -> dict:
        """Vega-Lite v5 spec (plain dict, no Altair) — the reference's
        match_weights_chart rendering entry point."""
        from .charts import match_weights_chart_spec
        return match_weights_chart_spec(self.settings)

    def m_u_parameters_chart(self) -> dict:
        from .charts import m_u_parameters_chart_spec
        return m_u_parameters_chart_spec(self.settings)

    def waterfall_chart(self, limit: int = 10) -> list[dict]:
        """One Vega-Lite waterfall spec per top-weight predicted pair."""
        from .charts import waterfall_chart_spec
        return [waterfall_chart_spec(recs)
                for recs in self.waterfall_chart_data(limit)]

    def match_weights_histogram(self, target_bins: int = 30) -> dict:
        """Histogram of predict() match weights (reference
        visualisations.py:112)."""
        from .charts import match_weights_histogram_spec
        return match_weights_histogram_spec(self.predict(), target_bins)

    def parameter_estimate_comparisons_chart(self, include_m: bool = True,
                                             include_u: bool = False) -> dict:
        """Parameter estimates across the estimation sessions run on this
        linker (reference visualisations.py:146); each estimate_* call
        records a (description, settings-snapshot) pair."""
        from .charts import parameter_estimate_comparisons_chart_spec
        return parameter_estimate_comparisons_chart_spec(
            self._parameter_estimates, include_m, include_u)

    def tf_adjustment_chart(self, column: str, n_most_freq: int = 10,
                            n_least_freq: int = 10,
                            vals_to_include: list[str] | None = None) -> dict:
        """Per-value TF-adjustment impact for a TF-adjusted comparison
        (reference visualisations.py:193 / term_frequencies.py:291)."""
        from .charts import tf_adjustment_chart_spec

        comp = next(
            (c for c in self.settings.comparisons
             if c.name == column and any(
                 lv.tf_adjustment for lv in c.levels)), None)
        if comp is None:
            raise ValueError(
                f"{column} is not a comparison column with term frequency "
                "adjustment activated")
        tf_col = next((lv.column or comp.column) for lv in comp.levels
                      if lv.tf_adjustment)
        tf_tables = self._ensure_tf_tables()
        if tf_col not in tf_tables:
            from .operators.nodes import compute_tf_table
            tf_tables[tf_col] = compute_tf_table(self.nodes(), tf_col)
        return tf_adjustment_chart_spec(
            tf_tables[tf_col], comp, self._n_records(),
            tf_style=self.settings.tf_style, n_most_freq=n_most_freq,
            n_least_freq=n_least_freq, vals_to_include=vals_to_include)

    def roc_chart(self, labels: DataFrame) -> dict:
        """ROC curve from pairwise labels via the truth-space table
        (reference accuracy_analysis_from_labels_table chart output)."""
        from .charts import roc_chart_spec
        return roc_chart_spec(self.truth_space(labels))

    def precision_recall_chart(self, labels: DataFrame) -> dict:
        from .charts import precision_recall_chart_spec
        return precision_recall_chart_spec(self.truth_space(labels))

    def comparison_viewer_data(self, example_rows_per_pattern: int = 2
                               ) -> DataFrame:
        from .charts import comparison_viewer_data
        return comparison_viewer_data(self.predict(), self.settings,
                                      example_rows_per_pattern)

    def cluster_studio_data(self, threshold_match_probability: float,
                            sample_clusters: int = 10
                            ) -> tuple[DataFrame, DataFrame]:
        from .charts import cluster_studio_data
        uid = self.settings.unique_id_column_name
        member = self.cluster(threshold_match_probability) \
            .select(F.col(uid).alias("node_id"), "cluster_id")
        edges = self.predict().where(
            F.col("match_probability") >= threshold_match_probability)
        return cluster_studio_data(member, edges, sample_clusters)

    def bridges(self, threshold_match_probability: float) -> DataFrame:
        """Bridge edges per cluster (graph_metrics.py:139-235 equivalent,
        distributed per cluster instead of igraph on the driver)."""
        from .operators.cluster import bridges as bridges_op
        uid = self.settings.unique_id_column_name
        member = self.cluster(threshold_match_probability) \
            .select(F.col(uid).alias("node_id"), "cluster_id")
        edges = self.predict().where(
            F.col("match_probability") >= threshold_match_probability) \
            .select("unique_id_l", "unique_id_r")
        return bridges_op(member, edges)

    # ---------------------------------------------------------- evaluation
    def truth_space(self, labels: DataFrame) -> DataFrame:
        return truth_space_table(labels, self.predict())

    def truth_space_from_labels_column(
            self, label_col: str, threshold_actual: float = 0.5,
            positives_not_captured_by_blocking_rules_scored_as_zero:
            bool = True) -> DataFrame:
        """Truth space from a ground-truth CLUSTER column (reference
        accuracy.py:337-404 / _predict_from_label_column_sql:498-527): the
        model's blocking rules are extended with an equi rule on the label
        column, so every intra-label pair is scored; pairs found ONLY by
        that label rule count as missed by blocking (scored -999), and
        label pairs never generated at all enter as implicit true negatives
        via the cartesian count."""
        from .accuracy import truth_space_from_labels_with_predictions
        from .model import block_on
        from .operators.blocking import block_using_rules

        uid = self.settings.unique_id_column_name
        nodes = self.nodes()
        n = nodes.count()
        if self.settings.link_type == "link_only":
            ds = self.settings.source_dataset_column_name
            counts = [r["n"] for r in nodes.groupBy(ds).agg(
                F.count(F.lit(1)).alias("n")).collect()]
            total_labels = 0.0
            for a in range(len(counts)):
                for b in range(a + 1, len(counts)):
                    total_labels += counts[a] * counts[b]
        else:
            total_labels = n * (n - 1) / 2.0
        new_mk = str(len(self.settings.blocking_rules))
        s2 = replace(
            self.settings,
            blocking_rules=tuple(self.settings.blocking_rules)
            + (block_on(label_col),),
            additional_columns_to_retain=tuple(
                set(self.settings.additional_columns_to_retain)
                | {label_col}),
        )
        pairs = block_using_rules(nodes, s2)
        cv = compute_comparison_vectors(pairs, nodes, s2)
        pred = predict_op(cv, s2, n_records=self._n_records())
        lp = pred.select(
            "match_weight",
            F.when(F.col(f"{label_col}_l") == F.col(f"{label_col}_r"),
                   F.lit(1.0)).otherwise(F.lit(0.0))
            .alias("clerical_match_score"),
            (F.col("match_key") != new_mk).alias("found_by_blocking_rules"),
        )
        return truth_space_from_labels_with_predictions(
            lp, total_labels, threshold_actual,
            positives_not_captured_by_blocking_rules_scored_as_zero)

    def cluster_f1(self, threshold: float, truth_col: str = "cluster") -> dict:
        uid = self.settings.unique_id_column_name
        mem = self.cluster(threshold).select(uid, "cluster_id", truth_col)
        return pairwise_cluster_f1(mem, truth_col=truth_col)


def _blocking_analysis_api():
    """Module-level re-exports for discoverability (reference
    blocking_analysis public API)."""
    from .operators.blocking import n_largest_blocks  # noqa: F401
    from .operators.brs import (  # noqa: F401
        count_comparisons_for_keys, find_rules_below_threshold,
        suggest_blocking_rules,
    )
