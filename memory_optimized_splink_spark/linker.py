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
from dataclasses import dataclass, replace

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


@dataclass
class GraphMetricsResults:
    """Node / edge / cluster metric tables (reference
    graph_metrics.py:17-60 GraphMetricsResults)."""
    nodes: DataFrame
    edges: DataFrame
    clusters: DataFrame


class SparkLinker:
    def __init__(
        self,
        spark: SparkSession,
        input_table: "DataFrame | list[DataFrame] | dict[str, DataFrame]",
        settings: "Settings | SettingsCreator | dict | str",
        checkpoint_dir: str | None = None,
        enable_checkpoints: bool = False,
    ):
        self.spark = spark
        # custom levels (incl. imported reference settings) may call the
        # comparator UDFs by SQL name, mirroring the reference's JAR
        # registration (spark/database_api.py:166-190); idempotent
        from .functions.similarity import register_udfs
        register_udfs(spark)
        # accept every settings form the reference Linker does
        # (reference linker.py:75,143-146: SettingsCreator | dict | path)
        from .settings_creator import resolve_settings
        self.settings = resolve_settings(settings).with_defaults()
        if isinstance(input_table, (list, tuple, dict)):
            input_table = self._concat_input_tables(input_table)
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
        # invalidate_cache() bumps this; it is part of every stage config
        # hash, so a bump makes all previously-checkpointed stages stale
        # (reference table_management.py:99-123 regenerates _cache_uid)
        self._cache_salt: str | None = None
        # fingerprints of user-registered TF lookups — in the config hash so
        # a registered lookup cannot silently resume a stale nodes stage
        self._registered_tf_fp: dict[str, dict] = {}
        self._registered_predict: DataFrame | None = None
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

    def _concat_input_tables(self, tables) -> DataFrame:
        """Reference Linker's multi-table input (linker.py:75: a list of
        tables for link jobs): vertically concatenate with a dataset tag
        (reference vertical concat, nodes.py:38-58) and make unique ids
        GLOBALLY unique by prefixing the dataset alias — input datasets
        routinely share id values, and every downstream join keys on the
        bare unique_id (same scheme as brs.cumulative_comparisons_link).
        Output ids read `<alias>:<original_id>`."""
        from dataclasses import replace as _replace

        named = (dict(tables) if isinstance(tables, dict) else
                 {f"__splink__input_table_{i}": df
                  for i, df in enumerate(tables)})
        if len(named) == 1:
            # a one-element list is just the table — don't tag or rewrite
            # ids (a link_only single table carries its own source_dataset
            # column, the standard reference pattern)
            return next(iter(named.values()))
        if self.settings.link_type == "dedupe_only":
            raise ValueError(
                "multiple input tables need link_type 'link_only' or "
                "'link_and_dedupe'")
        sds_existing = self.settings.source_dataset_column_name or \
            "source_dataset"
        if any(sds_existing in df.columns for df in named.values()):
            raise ValueError(
                f"input tables already carry a {sds_existing!r} column; "
                "pass ONE pre-concatenated table instead of a list")
        uid = self.settings.unique_id_column_name
        sds = self.settings.source_dataset_column_name or "source_dataset"
        parts = []
        for alias, df in named.items():
            parts.append(
                df.withColumn(sds, F.lit(alias)).withColumn(
                    uid, F.concat(F.lit(alias), F.lit(":"),
                                  F.col(uid).cast("string"))))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        if self.settings.source_dataset_column_name is None:
            self.settings = _replace(self.settings,
                                     source_dataset_column_name=sds)
        return out

    def _config(self, **extra) -> dict:
        cfg = {"settings": self.settings.to_json(),
               "input": self._input_identity(), **extra}
        if self._cache_salt:
            cfg["cache_salt"] = self._cache_salt
        if self._registered_tf_fp:
            cfg["registered_tf"] = self._registered_tf_fp
        return cfg

    def nodes(self) -> DataFrame:
        if self._nodes is None:
            def build():
                from .operators.vectors import ensure_phonetic_columns

                # pre-registered TF lookups (register_term_frequency_lookup)
                # take precedence over recomputation from the input
                df, tf = join_tf_columns(self._input, self.settings,
                                         self._tf_tables or None)
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
        if self._registered_predict is not None:
            # a pre-computed predict table was registered
            # (register_table_predict) — reference semantics: it IS the
            # cached __splink__df_predict, no recomputation
            return self._registered_predict
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
                keep_bf_columns=(
                    self.settings.retain_intermediate_calculation_columns),
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

    def deterministic_link(self) -> DataFrame:
        """Pairwise comparisons from the blocking rules alone — no model
        scoring (reference linker_components/inference.py:63-157). For
        deterministic linkage the rules should be strict enough that every
        generated pair is a true link; cluster the result with
        cluster_pairwise_predictions_at_threshold(det, None)."""
        nodes = self.nodes()
        pairs = self.blocked_pairs()
        return self.registry.stage(
            "deterministic_link", self._config(),
            lambda: compute_comparison_vectors(pairs, nodes, self.settings),
        )

    def cluster_pairwise_predictions_at_threshold(
            self, df_predict: DataFrame,
            threshold_match_probability: float | None = None,
            with_md5_ids: bool = False) -> DataFrame:
        """Cluster an EXPLICIT pairwise table (predict() output, a
        registered predict table, or deterministic_link() output — the
        latter has no match_probability column, so no threshold may be
        given; reference linker_components/clustering.py:43-181)."""
        if threshold_match_probability is not None \
                and "match_probability" not in df_predict.columns:
            raise ValueError(
                "df_predict must have a 'match_probability' column if "
                "threshold_match_probability is provided")
        edges = df_predict
        if threshold_match_probability is not None:
            edges = edges.where(
                F.col("match_probability") >= threshold_match_probability)
        uid = self.settings.unique_id_column_name
        nodes = self.nodes()
        member = solve_connected_components(
            nodes, edges.select("unique_id_l", "unique_id_r"),
            node_col=uid, with_md5_ids=with_md5_ids)
        return nodes.join(member.withColumnRenamed("node_id", uid), on=uid)

    def cluster_using_single_best_links(
            self, df_predict: DataFrame | None = None,
            duplicate_free_datasets: list[str] | None = None,
            threshold_match_probability: float | None = None) -> DataFrame:
        """One-to-one constrained clustering: clusters keep at most one
        record per source dataset in duplicate_free_datasets; links are
        accepted strongest-mutual-best-first (reference
        linker_components/clustering.py:183-320 / one_to_one_clustering.py).
        Requires a source_dataset column (link settings)."""
        from .operators.cluster_extras import one_to_one_clustering

        sd = self.settings.source_dataset_column_name
        if not sd:
            raise ValueError(
                "cluster_using_single_best_links requires settings with a "
                "source_dataset_column_name")
        pred = df_predict if df_predict is not None else self.predict()
        uid = self.settings.unique_id_column_name
        member = one_to_one_clustering(
            self.nodes().select(F.col(uid), F.col(sd)),
            pred, node_col=uid, source_dataset_col=sd,
            duplicate_free_datasets=duplicate_free_datasets,
            threshold_match_probability=threshold_match_probability)
        return self.nodes().join(
            member.withColumnRenamed("node_id", uid), on=uid)

    # ------------------------------------------------------------ training
    def estimate_u(self, max_pairs: float = 1e6,
                   seed: int | None = None) -> "SparkLinker":
        self.settings = train_mod.estimate_u_using_random_sampling(
            self.nodes(), self.settings, max_pairs=max_pairs, seed=seed
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

    # ---------------------------------------------------- table management
    # Reference: linker_components/table_management.py and misc.py. Spark
    # has no "database the linker writes tables into" — temp views play the
    # physical-table role and the checkpoint registry plays the cache.

    def register_table(self, input_data, table_name: str,
                       overwrite: bool = False) -> DataFrame:
        """Register str/pandas/list-of-dicts/DataFrame as a temp view usable
        from query_sql (reference table_management.py:306-366)."""
        from .sources.registry import register_table as _reg
        return _reg(self.spark, input_data, table_name, overwrite=overwrite)

    def register_table_predict(self, input_data,
                               overwrite: bool = False) -> DataFrame:
        """Register a pre-computed predict table; subsequent predict() /
        cluster() calls use it instead of recomputing (reference
        table_management.py:154-183)."""
        df = self.register_table(input_data, "__splink__df_predict",
                                 overwrite=overwrite)
        self._registered_predict = df
        return df

    def register_term_frequency_lookup(self, input_data, col_name: str,
                                       overwrite: bool = False,
                                       values_are_proportions: bool = False
                                       ) -> DataFrame:
        """Register a pre-computed TF lookup for `col_name`; linkage uses it
        instead of recomputing from the input (reference
        table_management.py:185-230). This engine's TF unit is the value
        COUNT (term_frequencies.py semantics normalise by n_records at
        score time); pass values_are_proportions=True for a reference-style
        proportions table and it is rescaled by the column's non-null
        count."""
        from .sources.registry import read_any

        if col_name in self._tf_tables and not overwrite:
            raise ValueError(
                f"a TF lookup for {col_name} is already registered; pass "
                "overwrite=True to replace it")
        tf_col = f"tf_{col_name}"
        df = read_any(self.spark, input_data)
        if not {col_name, tf_col} <= set(df.columns):
            raise ValueError(
                f"TF lookup for {col_name} must have columns "
                f"({col_name}, {tf_col}); got {df.columns}")
        df = df.select(col_name, F.col(tf_col).cast("double").alias(tf_col))
        if values_are_proportions:
            n_non_null = self._input.where(
                F.col(col_name).isNotNull()).count()
            df = df.select(
                col_name,
                (F.col(tf_col) * F.lit(float(n_non_null))).alias(tf_col))
        # fingerprint into the stage-config hash so checkpointed stages
        # built WITHOUT this lookup cannot be resumed as if they had it
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr(f"bit_xor(xxhash64({col_name}, {tf_col}))"),
                F.lit(0)).alias("h")).collect()[0]
        self._registered_tf_fp[col_name] = {"n": row["n"], "h": row["h"]}
        self._tf_tables[col_name] = df
        # memoized stages derived from the old TF values are stale
        self._nodes = None
        self._n_records_cache = None
        self._local_scorer = None
        return df

    def compute_tf_table(self, column_name: str,
                         is_array_column: bool = False,
                         ordered: bool = False,
                         tokenize: bool = False) -> DataFrame:
        """Term-frequency count table for one column (reference
        table_management.py:31-98). The plain (non-array, non-tokenized)
        variant is cached for reuse by nodes()/realtime scoring — it is
        exactly the table the nodes stage would compute from the same
        input, so checkpoint identity is unchanged. Persist it with
        df.write.parquet(...) and feed it back on a later run via
        register_term_frequency_lookup."""
        from .operators.nodes import compute_tf_table as _ctf

        df = _ctf(self._input, column_name, is_array=is_array_column,
                  tokenize=tokenize)
        if not is_array_column and not tokenize:
            self._tf_tables.setdefault(column_name, df)
        if ordered:
            df = df.orderBy(F.desc(f"tf_{column_name}"))
        return df

    def register_table_input_nodes_concat_with_tf(
            self, input_data, overwrite: bool = False) -> DataFrame:
        """Register a pre-computed nodes-with-TF table (the output of a
        prior run's nodes stage) so linkage starts from it instead of
        recomputing (reference table_management.py:125-151). The table is
        fingerprinted into every downstream stage-config hash, so
        checkpointed blocking/vector stages built from DIFFERENT nodes
        cannot be silently resumed."""
        from .sources.registry import read_any

        if self._nodes is not None and not overwrite:
            raise ValueError(
                "a nodes table is already computed/registered; pass "
                "overwrite=True to replace it")
        df = read_any(self.spark, input_data)
        missing = set(self._input.columns) - set(df.columns)
        if missing:
            raise ValueError(
                f"registered nodes table is missing input columns "
                f"{sorted(missing)}")
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.expr(f"bit_xor(xxhash64("
                       f"{self.settings.unique_id_column_name}))"),
                F.lit(0)).alias("h")).collect()[0]
        self._registered_tf_fp["__nodes__"] = {"n": row["n"], "h": row["h"]}
        self._nodes = df
        self._n_records_cache = None
        self._local_scorer = None
        return df

    def invalidate_cache(self) -> None:
        """Drop every memoized/checkpointed intermediate so the next call
        recomputes from the input (reference table_management.py:99-123 —
        there by regenerating the cache uid; here the salt enters every
        stage-config hash)."""
        import uuid

        self._cache_salt = uuid.uuid4().hex[:8]
        self._nodes = None
        self._tf_tables = {}
        self._input_fp = None
        self._n_records_cache = None
        self._local_scorer = None
        self._registered_predict = None

    def delete_tables_created_by_splink_from_db(self) -> None:
        """Remove this linker's checkpoint directory (the engine's
        equivalent of the reference's physical splink tables;
        table_management.py:285-303) through the Hadoop FileSystem API so
        HDFS/S3A checkpoint locations work, not only the driver's disk."""
        base = self.registry.base_dir
        try:
            jpath = self.spark._jvm.org.apache.hadoop.fs.Path(base)
            fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
            if fs.exists(jpath):
                fs.delete(jpath, True)
        except Exception:
            import shutil
            shutil.rmtree(base, ignore_errors=True)

    def query_sql(self, sql: str, output_type: str = "dataframe"):
        """Run arbitrary SQL against the session; views registered via
        register_table* are in scope (reference misc.py:54-92). output_type:
        'dataframe' (Spark) or 'pandas'."""
        out = self.spark.sql(sql)
        if output_type in ("dataframe", "splink_df", "splinkdf"):
            return out
        if output_type == "pandas":
            return out.toPandas()
        raise ValueError(
            f"output_type '{output_type}' is not supported; use "
            "'dataframe' or 'pandas'")

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

    def unlinkables_chart(self, x_col: str = "match_weight") -> dict:
        """Vega-Lite spec of the unlinkables() cumulative distribution
        (reference charts.py:356 via evaluation.py:338)."""
        from .charts import unlinkables_chart_spec
        return unlinkables_chart_spec(self.unlinkables(), x_col=x_col)

    def completeness_chart(self, columns: list[str] | None = None) -> dict:
        """Per-column non-null share heatmap (reference completeness_chart;
        data from operators.profiling.completeness_data)."""
        from .charts import completeness_chart_spec
        from .operators.profiling import completeness_data

        cols = columns or [
            c.column for c in self.settings.comparisons
            if c.column in self._input.columns]
        return completeness_chart_spec(completeness_data(
            self._input,
            source_dataset_col=self.settings.source_dataset_column_name,
            columns=cols))

    def cumulative_comparisons_chart(self) -> dict:
        """Comparisons generated per blocking rule, cumulative (reference
        cumulative_blocking_rule_comparisons_generated chart)."""
        from pyspark.sql import Window
        from .charts import cumulative_comparisons_chart_spec

        per = self.blocked_pairs().groupBy("match_key").agg(
            F.count(F.lit(1)).alias("row_count"))
        w = Window.orderBy("match_key").rowsBetween(
            Window.unboundedPreceding, Window.currentRow)
        return cumulative_comparisons_chart_spec(per.select(
            "match_key", "row_count",
            F.sum("row_count").over(w).alias("cumulative_rows")))

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

    def _label_column_predictions(self, label_col: str
                                  ) -> tuple[DataFrame, float]:
        """Score every intra-label pair by extending the blocking rules
        with an equi rule on the label column (reference
        accuracy.py:337-404 / _predict_from_label_column_sql:498-527).
        Returns (pred, total_labels) where pred carries the usual predict
        columns plus clerical_match_score (label equality) and
        found_by_blocking_rules (pair generated by a MODEL rule, not only
        the added label rule), and total_labels is the cartesian label-pair
        count (C(n,2) for dedupe; cross-dataset product for link_only)."""
        from .model import block_on
        from .operators.blocking import block_using_rules

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
        pred = pred.withColumn(
            "clerical_match_score",
            F.when(F.col(f"{label_col}_l") == F.col(f"{label_col}_r"),
                   F.lit(1.0)).otherwise(F.lit(0.0)),
        ).withColumn(
            "found_by_blocking_rules", F.col("match_key") != new_mk)
        return pred, total_labels

    def truth_space_from_labels_column(
            self, label_col: str, threshold_actual: float = 0.5,
            positives_not_captured_by_blocking_rules_scored_as_zero:
            bool = True) -> DataFrame:
        """Truth space from a ground-truth CLUSTER column (reference
        accuracy.py:337-404): pairs found ONLY by the added label rule
        count as missed by blocking (scored -999), and label pairs never
        generated at all enter as implicit true negatives via the
        cartesian count."""
        from .accuracy import truth_space_from_labels_with_predictions

        pred, total_labels = self._label_column_predictions(label_col)
        lp = pred.select("match_weight", "clerical_match_score",
                         "found_by_blocking_rules")
        return truth_space_from_labels_with_predictions(
            lp, total_labels, threshold_actual,
            positives_not_captured_by_blocking_rules_scored_as_zero)

    def register_labels_table(self, input_data,
                              overwrite: bool = False) -> DataFrame:
        """Register a clerical-labels table ((source_dataset_l,)
        unique_id_l, (source_dataset_r,) unique_id_r, clerical_match_score)
        for the evaluation methods (reference
        table_management.py:279-283)."""
        df = self.register_table(input_data, "__splink__labels",
                                 overwrite=overwrite)
        need = {"unique_id_l", "unique_id_r", "clerical_match_score"}
        if not need <= set(df.columns):
            raise ValueError(
                f"labels table must have columns {sorted(need)}; "
                f"got {df.columns}")
        return df

    def prediction_errors_from_labels_table(
            self, labels: DataFrame,
            include_false_positives: bool = True,
            include_false_negatives: bool = True,
            threshold_match_probability: float = 0.5) -> DataFrame:
        """FP/FN rows vs a clerical-labels table at one probability
        threshold (reference evaluation.py:38-89 /
        accuracy.py:447-560)."""
        from .accuracy import prediction_errors

        thr_w = math.log2(prob_to_bayes_factor(threshold_match_probability))
        errs = prediction_errors(labels, self.predict(),
                                 threshold_weight=thr_w)
        if not include_false_positives:
            errs = errs.where(F.col("error_type") != "FP")
        if not include_false_negatives:
            errs = errs.where(F.col("error_type") != "FN")
        return errs

    def prediction_errors_from_labels_column(
            self, label_colname: str,
            include_false_positives: bool = True,
            include_false_negatives: bool = True,
            threshold_match_probability: float = 0.5) -> DataFrame:
        """FP/FN rows vs a ground-truth cluster COLUMN (reference
        evaluation.py:299-337): the label-extended blocking scores every
        intra-label pair, so false negatives the model's own blocking never
        generated are still surfaced (they carry found_by_blocking_rules =
        false)."""
        pred, _ = self._label_column_predictions(label_colname)
        pred_pos = (F.col("match_probability")
                    >= F.lit(float(threshold_match_probability))) \
            & F.col("found_by_blocking_rules")
        is_pos = F.col("clerical_match_score") >= F.lit(0.5)
        errs = pred.withColumn(
            "error_type",
            F.when(pred_pos & ~is_pos, F.lit("FP"))
             .when(~pred_pos & is_pos, F.lit("FN")),
        ).where(F.col("error_type").isNotNull())
        if not include_false_positives:
            errs = errs.where(F.col("error_type") != "FP")
        if not include_false_negatives:
            errs = errs.where(F.col("error_type") != "FN")
        return errs

    _ACCURACY_OUTPUTS = ("threshold_selection", "roc", "precision_recall",
                         "table", "accuracy")

    def _accuracy_output(self, truth_space: DataFrame, output_type: str,
                         add_metrics: list[str]):
        from .accuracy import add_accuracy_metrics
        from .charts import (accuracy_chart_spec, precision_recall_chart_spec,
                             roc_chart_spec, threshold_selection_tool_spec)

        ts = add_accuracy_metrics(truth_space, add_metrics)
        if output_type == "table":
            return ts
        if output_type == "roc":
            return roc_chart_spec(ts)
        if output_type == "precision_recall":
            return precision_recall_chart_spec(ts)
        if output_type == "accuracy":
            return accuracy_chart_spec(ts, add_metrics)
        if output_type == "threshold_selection":
            return threshold_selection_tool_spec(ts, add_metrics)
        raise ValueError(
            f"invalid output_type '{output_type}'; allowed: "
            f"{', '.join(self._ACCURACY_OUTPUTS)}")

    def accuracy_analysis_from_labels_table(
            self, labels: DataFrame, *,
            threshold_match_probability: float = 0.5,
            output_type: str = "threshold_selection",
            add_metrics: list[str] | None = None):
        """Accuracy chart spec or extended truth-space table from a
        clerical-labels table (reference evaluation.py:186-298).
        output_type: threshold_selection | roc | precision_recall | table |
        accuracy; add_metrics extends precision/recall with any of
        specificity, npv, accuracy, f1, f2, f0_5, p4, phi."""
        ts = truth_space_table(labels, self.predict(),
                               positive_threshold=threshold_match_probability)
        return self._accuracy_output(ts, output_type, list(add_metrics or []))

    def accuracy_analysis_from_labels_column(
            self, labels_column_name: str, *,
            threshold_match_probability: float = 0.5,
            output_type: str = "threshold_selection",
            add_metrics: list[str] | None = None,
            positives_not_captured_by_blocking_rules_scored_as_zero:
            bool = True):
        """Accuracy chart spec or extended truth-space table from a
        ground-truth cluster column (reference evaluation.py:90-185)."""
        ts = self.truth_space_from_labels_column(
            labels_column_name,
            threshold_actual=threshold_match_probability,
            positives_not_captured_by_blocking_rules_scored_as_zero=(
                positives_not_captured_by_blocking_rules_scored_as_zero))
        return self._accuracy_output(ts, output_type, list(add_metrics or []))

    def compute_graph_metrics(
            self, df_predict: DataFrame | None = None,
            df_clustered: DataFrame | None = None, *,
            threshold_match_probability: float) -> "GraphMetricsResults":
        """Node / edge / cluster graph metrics (reference
        clustering.py:480-550 + graph_metrics.py): node degree, per-cluster
        size/edges/density/centralisation, and per-edge is_bridge (the
        distributed per-cluster Tarjan)."""
        from .operators.cluster import bridges as bridges_op, graph_metrics

        uid = self.settings.unique_id_column_name
        pred = df_predict if df_predict is not None else self.predict()
        if df_clustered is None:
            df_clustered = self.cluster(threshold_match_probability)
        member = df_clustered.select(F.col(uid).alias("node_id"),
                                     "cluster_id")
        edges = pred.where(F.col("match_probability")
                           >= threshold_match_probability) \
            .select("unique_id_l", "unique_id_r")
        node_metrics, cluster_metrics = graph_metrics(member, edges)
        edge_metrics = bridges_op(member, edges)
        return GraphMetricsResults(nodes=node_metrics, edges=edge_metrics,
                                   clusters=cluster_metrics)

    def cluster_f1(self, threshold: float, truth_col: str = "cluster") -> dict:
        uid = self.settings.unique_id_column_name
        mem = self.cluster(threshold).select(uid, "cluster_id", truth_col)
        return pairwise_cluster_f1(mem, truth_col=truth_col)

    # -------------------------------------------------- training aliases
    # Reference-name entry points (linker_components/training.py); each
    # delegates to the engine-native method it documents.

    def estimate_probability_two_random_records_match(
            self, deterministic_matching_rules: list, recall: float
    ) -> "SparkLinker":
        """Reference training.py:34-158 — estimate λ from deterministic
        rules + assumed recall (native name: estimate_lambda)."""
        return self.estimate_lambda(deterministic_matching_rules, recall)

    def estimate_u_using_random_sampling(self, max_pairs: float = 1e6,
                                         seed: int | None = None
                                         ) -> "SparkLinker":
        """Reference training.py:160-209 (native name: estimate_u)."""
        return self.estimate_u(max_pairs=max_pairs, seed=seed)

    def estimate_parameters_using_expectation_maximisation(
            self, blocking_rule, fix_u: bool = True) -> list[dict]:
        """Reference training.py:210-315 (native name:
        estimate_m_with_em). Returns the per-iteration history."""
        return self.estimate_m_with_em(blocking_rule, fix_u=fix_u)

    def estimate_m_from_pairwise_labels(self, labels: DataFrame
                                        ) -> "SparkLinker":
        """m-probabilities from a table of known-match pairs (reference
        training.py:316-352): the labelled pairs are scored with the
        current model and their gamma distribution sets m directly."""
        self.settings = train_mod.estimate_m_from_pairwise_labels(
            self.nodes(), self.settings, labels)
        self._parameter_estimates.append(
            ("m from pairwise labels", self.settings))
        return self

    # ------------------------------------------------------------- misc
    def save_model_to_json(self, out_path: str | None = None,
                           overwrite: bool = False) -> dict:
        """Serialize the trained model as a reference-format settings dict
        (reference misc.py:21-52), optionally writing it to a file."""
        import json
        import os

        from .interop import settings_to_splink_dict

        d = settings_to_splink_dict(self.settings)
        if out_path:
            if os.path.exists(out_path) and not overwrite:
                raise FileExistsError(
                    f"{out_path} exists; pass overwrite=True to replace")
            with open(out_path, "w") as f:
                json.dump(d, f, indent=2)
        return d

    # --------------------------------------------------- dashboard writers
    def comparison_viewer_dashboard(
            self, out_path: str, overwrite: bool = False,
            example_rows_per_pattern: int = 2,
            max_patterns: int = 200) -> str:
        """Write the single-file comparison-viewer HTML (reference
        visualisations.py:299-357)."""
        import os

        from .dashboards import comparison_viewer_dashboard as _cvd

        if os.path.exists(out_path) and not overwrite:
            raise FileExistsError(
                f"{out_path} exists; pass overwrite=True to replace")
        return _cvd(self.predict(), self.settings,
                    example_rows_per_pattern=example_rows_per_pattern,
                    max_patterns=max_patterns, out_path=out_path)

    def cluster_studio_dashboard(
            self, threshold_match_probability: float, out_path: str,
            overwrite: bool = False, sample_clusters: int = 10) -> str:
        """Write the single-file cluster-studio HTML (reference
        visualisations.py:358-430)."""
        import os

        from .dashboards import cluster_studio_dashboard as _csd

        if os.path.exists(out_path) and not overwrite:
            raise FileExistsError(
                f"{out_path} exists; pass overwrite=True to replace")
        member, edges = self.cluster_studio_data(
            threshold_match_probability, sample_clusters)
        return _csd(member, edges, out_path=out_path)

    def labelling_tool_for_specific_record(
            self, record: dict, out_path: str = "labelling_tool.html",
            overwrite: bool = False, match_weight_threshold: float = -4.0,
            show_splink_predictions_in_interface: bool = True) -> str:
        """Write the offline labelling-tool HTML for one record's
        candidate matches (reference evaluation.py:372-430 /
        labelling_tool.py)."""
        import os

        from .dashboards import (generate_labelling_tool_comparisons,
                                 labelling_tool_dashboard)

        if os.path.exists(out_path) and not overwrite:
            raise FileExistsError(
                f"{out_path} exists; pass overwrite=True to replace")
        matches = generate_labelling_tool_comparisons(
            self, record, match_weight_threshold=match_weight_threshold)
        return labelling_tool_dashboard(
            matches, self.settings,
            show_predictions=show_splink_predictions_in_interface,
            out_path=out_path)


def _blocking_analysis_api():
    """Module-level re-exports for discoverability (reference
    blocking_analysis public API)."""
    from .operators.blocking import n_largest_blocks  # noqa: F401
    from .operators.brs import (  # noqa: F401
        count_comparisons_for_keys, find_rules_below_threshold,
        suggest_blocking_rules,
    )
