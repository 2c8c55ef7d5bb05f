"""Connected components: large-star/small-star with per-iteration checkpoints.

The reference solves transitive closure by iterative min-label propagation
with converged-cluster freezing
(/root/reference/splink/internals/connected_components.py:93-526). This
engine implements the **alternating large-star/small-star algorithm** the
reference itself cites (connected_components.py:1-9, arXiv:1802.09478
"Connected Components in MapReduce and Beyond"): the same fixpoint (every
node linked to its component minimum) in O(log^2 n) rounds instead of
O(diameter) — the difference between ~60 and ~15 shuffles on long-path
graphs at 10^12-edge scale.

Scale design:
- node ids are compacted to longs once (monotonically_increasing_id — no
  sort, no window) so every CC shuffle moves 8-byte keys instead of 64-char
  sha strings; mapped back at the end.
- every iteration ends in localCheckpoint(eager) — lineage truncation is
  mandatory for iterative DataFrame algorithms (reference persists each
  representatives table, spark/database_api.py:283-303).
- convergence test is an aggregate (count + xxhash64 checksum), not a
  collect of the edge list.
- final md5 cluster id = md5(comma-joined sorted member list)
  (connected_components.py:504-518) is opt-in: it needs a collect_list per
  cluster, which is unboundedly skewed for giant clusters. The default
  cluster id is the component-minimum node id (stable & deterministic).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from ..model import Settings


def _checkpoint(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def _free_checkpoint(df: DataFrame) -> None:
    """Best-effort unpersist of a localCheckpoint'ed frame's cached blocks.

    The star loop materializes one edge set + one per-node stats table per
    round; without this, every round's blocks stay in the block store for
    the life of the session (23 rounds x ~2x 5M-row tables on the path-
    graph shape = gigabytes of dead cache competing with execution memory).
    Safe exactly because a local checkpoint's lineage is truncated: once
    the NEXT round is materialized, nothing can (or will) read the
    previous round's RDD again. Non-blocking; never raises."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _round_stats(edges: DataFrame, npart: int, keep_per: bool = False
                 ) -> tuple[int, int, DataFrame | None]:
    """(n_edge_rows, n_violating_nodes, per_node) in ONE aggregate job over
    the round output; star forest <=> n_violating_nodes == 0.
    DUPLICATE-INSENSITIVE: the round output is allowed to carry
    duplicate (u, v) rows (the loop defers the closing distinct — see
    connected_components_long), so the check is on the edge SET:

    A round output (all rows satisfy u > v structurally) is a star forest
    exactly when no u-node has two DISTINCT targets and no node appears in
    both columns. Per node the first test is min(target) < max(target) —
    min/max/sum on the shuffled frame, where a count(DISTINCT ...) would
    plan a second exchange. Star forest <=> fixpoint of the large/small-
    star round, and the u > v invariant forces every star root to be its
    component MINIMUM — so stopping here yields the same assignment as the
    old stop rule (checksum unchanged after one more round), one full round
    earlier.

    n_edge_rows counts ROWS (an upper bound on distinct edges), which is
    all its consumer needs: `_star_partitions` sizing. Two measured shape
    choices: (a) the explicit repartition(npart, n) + single-level
    aggregate beats letting groupBy plan its own two-level aggregate here
    (0.4s vs 1.0s at a 15.8M-edge round — u keys are unique, so a
    map-side partial aggregate collapses almost nothing and pays a second
    aggregate pass + AQE coalesce for it); (b) the target value rides the
    u-side rows ONLY, with NULL on the v-side rows — the frame stays two
    8-byte columns (the same shuffle bytes as a plain membership frame),
    appears-as-v falls out as count(*) > count(t), and min/max ignore the
    NULLs.

    The symmetrized frame is built with ONE scan of `edges` (explode of a
    2-struct array), not a unionAll of two scans: this makes the stats job
    a single-scan consumer, so the caller can hand it a LAZY localCheckpoint
    and the round's materialization fuses into this job (one pass over the
    round output per round instead of two, and one job fewer) without the
    double-compute hazard a two-branch union has over an unmaterialized
    cache.

    With `keep_per`, the per-node frame (n, tmin, viol, rows_u) — one row
    per node of the round output, lazily checkpointed and materialized by
    this very aggregate — is returned: it IS the assignment table. For a
    node with u-side rows, coalesce(tmin, n) = min of its targets, and
    since every round-output row satisfies u > v, min(targets ∪ {self}) =
    min(targets) — exactly the min-per-node the old assignment tail
    recomputed with a fresh scan + repartition + groupBy over the fixpoint
    edge set; for a v-only node (a root) tmin is NULL and coalesce yields
    the node itself. This holds for ANY loop exit (star fixpoint or
    max_iterations), so when the FINAL round's stats kept its per table,
    the assignment tail reads it instead of re-shuffling the edge set —
    one full O(edges) keyed shuffle per solve removed. Caching the table
    costs a ~33 B/node block-store write inside the stats job (measured
    +0.3 s/round at 5M path-graph nodes), so the caller only sets
    `keep_per` on rounds it predicts are final; a misprediction just
    re-runs this aggregate once, which is the old tail's exact cost."""
    nodes_fr = edges.select(F.explode(F.array(
        F.struct(F.col("u").alias("n"), F.col("v").alias("t")),
        F.struct(F.col("v").alias("n"),
                 F.lit(None).cast("long").alias("t")),
    )).alias("_e")).select("_e.n", "_e.t")
    per = (
        nodes_fr.repartition(npart, "n").groupBy("n")
        .agg(F.min("t").alias("tmin"), F.max("t").alias("tmax"),
             F.count("t").alias("rows_u"), F.count(F.lit(1)).alias("rows_t"))
        .select(
            "n", "tmin", "rows_u",
            ((F.col("tmin") < F.col("tmax"))
             | ((F.col("rows_u") > 0)
                & (F.col("rows_t") > F.col("rows_u")))).alias("viol"),
        )
    )
    if keep_per:
        per = per.localCheckpoint(eager=False)
    row = per.agg(
        F.sum("rows_u").alias("n_rows"),
        F.sum(F.when(F.col("viol"), 1).otherwise(0)).alias("viol"),
    ).collect()[0]
    return (int(row["n_rows"] or 0), int(row["viol"] or 0),
            per if keep_per else None)


def _star_partitions(n_edges: int, spark) -> int:
    """Shuffle-partition count for one star round, sized from the EDGE COUNT
    instead of inherited from `spark.sql.shuffle.partitions`.

    Why this exists: a CC input arriving from a big upstream join inherits
    that join's partition layout (with AQE skew-splitting, thousands of map
    partitions), and the session-level shuffle setting is sized for the PAIR
    table, not the compacted 16-byte edge table. Left alone, round 1 of the
    star loop becomes `(thousands of maps) x (session reducers)` shuffle
    files — at 63.8M edges that is ~5M index+data file commits, which all
    serialize through IndexShuffleBlockResolver's per-executor commit lock
    (observed: 17/32 task threads blocked on that monitor, wall 12x worse
    than a right-sized run). ~1.5M symmetrized rows/partition keeps a
    partition at ~50 MB of UnsafeRows, and the count shrinks with the edge
    set as rounds converge."""
    dp = spark.sparkContext.defaultParallelism
    cap = int(spark.conf.get("spark.sql.shuffle.partitions"))
    want = -(-2 * n_edges // 1_500_000)  # ceil; nbrs table is 2x edges
    return max(min(dp, cap), min(cap, want, 4096))


def _large_star(edges: DataFrame, npart: int | None = None,
                dedupe: bool = True) -> DataFrame:
    """One large-star step as a SINGLE windowed pass (no self-join).

    For each node u, m = min(N(u) ∪ {u}); emit (v -> m) for every strictly
    larger neighbour v. The min is a whole-partition window over the
    symmetrized neighbour list: one exchange on hash(u), one sort, one pass
    — where the join formulation planned the neighbour union into BOTH join
    sides (a SortMergeJoin with two sorts) and re-planned the whole subtree
    once per downstream consumer (three large-star subtrees per round in
    the round-5 physical plan; AQE exchange-reuse deduplicated the shuffles
    but every consumer re-ran the aggregates and sorts above them).

    dedupe=False defers the closing distinct to the caller: inside the star
    loop the next operation is small-star's repartition+distinct on the
    same key, which subsumes it (one shuffle instead of two)."""
    from pyspark.sql import Window

    rep = (["u"] if npart is None else [npart, "u"])
    nbrs = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).repartition(*rep)
    m = F.least(F.min("v").over(Window.partitionBy("u")), F.col("u"))
    out = (
        nbrs.select("u", "v", m.alias("m"))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    # m <= u < v by construction, so the u != v guard is structural
    if not dedupe:
        return out
    if npart is not None:
        out = out.repartition(npart, "u")
    return out.distinct()


def _small_star(edges: DataFrame, npart: int | None = None,
                assume_normalized: bool = False,
                dedupe_output: bool = True) -> DataFrame:
    """One small-star step, also join-free.

    Rows are normalized to (a=greatest, b=least); per group a with
    m = min(b): every member b links to m, and a itself links to m exactly
    once. With DISTINCT (a, b) rows, "once" falls out structurally: the
    single row where b == m emits (a -> m) instead of the degenerate
    (m -> m) — so the whole step is repartition -> distinct -> window min
    (sort only, same partitioning) -> one conditional projection. No union,
    no join, no second pass.

    assume_normalized=True skips the greatest/least projection — valid for
    large-star output, whose rows satisfy u > v by construction (the star
    loop always calls it this way).

    dedupe_output=False skips the closing repartition+distinct — one full
    edge-set shuffle per round. Output rows are unique WITHIN each input
    group a (the frame is distinct), but the same (b -> m) can arise from
    two groups that share member b and minimum m. Such duplicates are
    harmless to every loop consumer: the next round's first
    repartition+distinct subsumes the dedupe, _round_stats is duplicate-
    insensitive by construction, and the final assignment takes a min per
    node. The standalone default keeps the distinct."""
    from pyspark.sql import Window

    if assume_normalized:
        e = edges
    else:
        e = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).where(F.col("u") != F.col("v"))
    rep = (["u"] if npart is None else [npart, "u"])
    # distinct under hash(u) partitioning: HashPartitioning(u) satisfies
    # the (u, v) clustering requirement (subset rule), so the aggregate
    # and the window both run inside this single exchange
    e = e.repartition(*rep).distinct()
    mb = F.min("v").over(Window.partitionBy("u"))
    out = e.select(
        F.when(F.col("v") == mb, F.col("u")).otherwise(F.col("v")).alias("u"),
        mb.alias("v"),
    ).where(F.col("u") != F.col("v"))
    if not dedupe_output:
        return out
    if npart is not None:
        out = out.repartition(npart, "u")
    return out.distinct()


def connected_components_long(edges: DataFrame, max_iterations: int = 50,
                              stats: dict | None = None) -> DataFrame:
    """edges(u long, v long) -> assignments(u long, rep long) for every node
    that appears in an edge. rep = component minimum.

    Duplicate/symmetric input edges are fine: the first star round's own
    distinct() subsumes a separate pre-dedup pass (one shuffle saved).

    Pass a dict as `stats` to receive {"rounds": n} — the number of
    large-star/small-star rounds run INCLUDING the final no-change round
    that proves the fixpoint (scale evidence: rounds grows O(log^2 n)).

    Every round runs at `_star_partitions(n_edges)` shuffle partitions —
    sized from the live edge count (known for free from the convergence
    checksum), not the session default, so the file/partition count tracks
    the 16-byte edge table down as it converges instead of staying pinned
    at a setting sized for the upstream pair table."""
    spark = edges.sparkSession
    # LAZY checkpoint + count: the count is the materializing action, so
    # the input edge set is computed in ONE pass (an eager checkpoint runs
    # a separate materialization job first and the count re-scans the
    # cached blocks). The count is a single-scan consumer, so there is no
    # double-compute hazard; everything downstream reads the frozen cache.
    e = edges.select("u", "v").where(F.col("u") != F.col("v")) \
        .localCheckpoint(eager=False)
    n_edges = e.count()
    if not n_edges:
        if stats is not None:
            stats["rounds"] = 0
        return e.select(F.col("u"), F.col("v").alias("rep")).limit(0)
    # Bound the MAP side of round 1. When the compaction joins are
    # broadcast (narrow), the checkpointed edge table inherits the
    # upstream pair join's partition count — with AQE skew-splitting,
    # thousands of map partitions for a 16-byte-row table. Round 1 then
    # writes (inherited maps) x (star reducers) shuffle files; at 63.8M
    # edges that map-width gap alone made round 1 ~2.3x slower than the
    # sort-merge path, whose compaction shuffle AQE had already coalesced
    # to a few dozen partitions. coalesce() is narrow over the checkpoint
    # (no shuffle, no rewrite): each of the npart round-1 map tasks just
    # reads several co-located checkpoint blocks.
    npart0 = _star_partitions(n_edges, spark)
    if stats is not None:
        stats["input_partitions"] = e.rdd.getNumPartitions()
    ckpt = e  # the checkpointed frame whose blocks hold the loop input
    if e.rdd.getNumPartitions() > 2 * npart0:
        e = e.coalesce(npart0)
    if stats is not None:
        stats["map_partitions"] = e.rdd.getNumPartitions()
    rounds = 0
    round_secs: list[float] = []
    round_parts: list[int] = []
    per = None
    # keep_per: cache the round's per-node stats table (the assignment
    # table, see _round_stats) only when this round is predicted FINAL —
    # round 1 (realistic linkage graphs are clique-heavy and converge
    # immediately; bench/cc-scale both stop at round 1) or any round after
    # the violation count dropped below ~1/16 of the edge rows. A false
    # positive costs one ~33 B/node cache write; a false negative re-runs
    # the stats aggregate once at the exit (the old tail's exact cost).
    keep_per = True
    for _ in range(max_iterations):
        t0 = time.time()
        npart = _star_partitions(n_edges, spark)
        round_parts.append(npart)
        prev_ckpt, prev_per = ckpt, per
        # fused round: large-star defers its dedupe into small-star's
        # repartition+distinct on the same key, and small-star's own
        # closing distinct is deferred to the NEXT round's opening
        # repartition+distinct (dedupe_output=False) — 2 exchanges per
        # round (nbrs window, small-in distinct+window) instead of 3; the
        # round output may carry cross-group duplicate rows, which the
        # duplicate-insensitive _round_stats and the min-per-node
        # assignment tail tolerate exactly (see their docstrings).
        # The checkpoint is LAZY: _round_stats scans the round output once
        # (explode form), so its aggregate job doubles as the
        # materialization — one pass over the round's edge set per round
        # instead of a materialize-then-rescan pair. The next round (or
        # the assignment tail), which DOES scan `e` twice, reads the cache
        # the stats job froze.
        e = _small_star(
            _large_star(e, npart, dedupe=False), npart,
            assume_normalized=True, dedupe_output=False) \
            .localCheckpoint(eager=False)
        ckpt = e
        rounds += 1
        n, viol, per = _round_stats(e, npart, keep_per=keep_per)
        n_edges = n or 1
        # the new round + its stats table are materialized now; the
        # previous round's blocks have no remaining consumer — free them
        # so the loop's block-store footprint stays O(1) rounds, not O(n)
        _free_checkpoint(prev_ckpt)
        if prev_per is not None:
            _free_checkpoint(prev_per)
        round_secs.append(round(time.time() - t0, 2))
        if not viol:
            # star forest reached: provably the fixpoint, roots are the
            # component minima (see _round_stats) — no proving round needed
            break
        keep_per = viol * 16 < n_edges
    if stats is not None:
        stats["rounds"] = rounds
        stats["round_secs"] = round_secs
        stats["round_partitions"] = round_parts
    if per is None and rounds:
        # the final round's stats ran without keeping its per table
        # (misprediction, or a max_iterations exit from a high-violation
        # loop): rebuild it once — the same one keyed shuffle the old
        # assignment tail always paid
        _, _, per = _round_stats(e, _star_partitions(n_edges, spark),
                                 keep_per=True)
    if per is None:  # max_iterations <= 0: no round ran, no per-node table
        assign = e.select(F.col("u"), F.col("v").alias("rep")).union(
            e.select(F.col("v").alias("u"), F.col("v").alias("rep"))
        ).repartition(_star_partitions(n_edges, spark), "u")
        return assign.groupBy("u").agg(F.min("rep").alias("rep"))
    # assignment = the last round's per-node aggregate, already materialized
    # by the stats job: coalesce(min target, self) is exactly the
    # min-per-node the old tail recomputed with a fresh scan + repartition +
    # groupBy over the fixpoint edge set (see _round_stats docstring; holds
    # for star AND max_iterations exits because round rows satisfy u > v)
    return per.select(
        F.col("n").alias("u"),
        F.coalesce(F.col("tmin"), F.col("n")).alias("rep"),
    )


def _compact_edges(idmap: DataFrame, edges: DataFrame, edge_l: str,
                   edge_r: str, broadcast_idmap_max_bytes: int,
                   measured_bytes: int | None = None) -> DataFrame:
    """edges(string, string) -> (u long, v long) via two idmap joins, with
    the idmap explicitly broadcast while its MEASURED materialized size
    fits the cap (see solve_connected_components docstring).
    `measured_bytes` lets the caller pass an already-measured size so the
    measuring aggregate runs once per solve, not once per call.

    ONE canonical idmap subtree serves both joins (same fix as the
    pair->node joins in vectors.pairs_with_columns): per-side projections
    with pre-renamed columns canonicalize differently, so Catalyst built
    and shipped the SAME idmap hash relation twice — both joins key on
    the bare `node_id` column of an identical subtree, letting the second
    join reuse the first's BroadcastExchange (one build, one copy resident
    per executor — hence the guard is est <= cap, not 2x)."""
    from .vectors import _measured_size_bytes

    b = idmap
    if broadcast_idmap_max_bytes:
        est = (measured_bytes if measured_bytes is not None
               else _measured_size_bytes(idmap))
        if est is not None and est <= broadcast_idmap_max_bytes:
            b = F.broadcast(b)
    e = edges.select(F.col(edge_l).alias("node_l"),
                     F.col(edge_r).alias("node_r"))
    out = e.join(b.alias("_il"),
                 F.col("node_l") == F.col("_il.node_id"), "inner")
    out = out.join(b.alias("_ir"),
                   F.col("node_r") == F.col("_ir.node_id"), "inner")
    return out.select(F.col("_il.nid").alias("u"),
                      F.col("_ir.nid").alias("v"))


def solve_connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "unique_id",
    edge_l: str = "unique_id_l",
    edge_r: str = "unique_id_r",
    with_md5_ids: bool = False,
    max_iterations: int = 50,
    stats: dict | None = None,
    broadcast_idmap_max_bytes: int = 1 << 30,
) -> DataFrame:
    """Per-node membership (node_col, cluster_id). Isolated nodes become
    singleton clusters (reference unions self-loops,
    connected_components.py:346-367 — here they just pass through).

    `stats` (optional dict) receives {"rounds": n} from the star loop.

    The string-id -> long compaction joins the EDGE table to the idmap on
    BOTH endpoints. Left to Catalyst past its 64 MB threshold these flip
    to sort-merge — two full shuffles + sorts of the (much larger) edge
    table by 64-char string keys before CC even starts (the same silent
    flip the round-4 scale run caught on the pair->node joins: at the
    518M-pair run the idmap is ~200 MB for 2.8M nodes, so 196M edges were
    re-shuffled twice). The idmap is already materialized (_checkpoint),
    so its ACTUAL size is measured with one aggregate and both joins are
    explicitly broadcast while 2x that size fits under
    `broadcast_idmap_max_bytes` (both aliased projections are resident
    per executor — the cap bounds the TOTAL). 0 disables the hint."""
    from .vectors import _measured_size_bytes

    ids = nodes.select(F.col(node_col).alias("node_id")).distinct()
    # LAZY checkpoint: the measuring aggregate (one scan) doubles as the
    # materialization job, freezing the monotonically_increasing_id values
    # before any other consumer runs — one pass instead of
    # materialize-then-rescan. If no aggregate ran (cap disabled or the
    # schema was unmeasurable), fall back to an explicit count: the
    # compaction joins scan idmap from two subtrees in one job, which must
    # never race to compute an unmaterialized nid column.
    idmap = ids.withColumn("nid", F.monotonically_increasing_id()) \
        .localCheckpoint(eager=False)
    idmap_bytes = (_measured_size_bytes(idmap)
                   if broadcast_idmap_max_bytes else None)
    if idmap_bytes is None:
        idmap.count()
    e = _compact_edges(idmap, edges, edge_l, edge_r,
                       broadcast_idmap_max_bytes, measured_bytes=idmap_bytes)
    assign = connected_components_long(e, max_iterations=max_iterations,
                                       stats=stats)
    # map back: rep nid -> rep node_id; isolated nodes rep = self.
    # assign has at most one row per edge-covered node (<= idmap rows, two
    # 8-byte longs each), so whenever the measured idmap fits the broadcast
    # cap, assign certainly does: both mapping joins become broadcast hash
    # joins and the membership table streams out of the checkpointed idmap
    # with ZERO exchanges (left alone, Catalyst planned the assign join as
    # a sort-merge — two full shuffles + sorts of 64-char string rows).
    rep_names = idmap.select(F.col("nid").alias("rep"),
                             F.col("node_id").alias("_rep_name"))
    if idmap_bytes is not None and 2 * idmap_bytes <= broadcast_idmap_max_bytes:
        assign = F.broadcast(assign)
        rep_names = F.broadcast(rep_names)
    member = (
        idmap.join(assign, idmap["nid"] == assign["u"], "left")
        .select(
            "node_id",
            F.coalesce(F.col("rep"), F.col("nid")).alias("rep"),
        )
        .join(rep_names, on="rep", how="left")
        .select(
            "node_id",
            F.coalesce(F.col("_rep_name"), F.col("node_id")).alias("cluster_id"),
        )
    )
    if with_md5_ids:
        md5_ids = (
            member.groupBy("cluster_id")
            .agg(
                F.md5(
                    F.concat_ws(",", F.sort_array(F.collect_list("node_id")))
                ).alias("cluster_md5")
            )
        )
        member = member.join(md5_ids, on="cluster_id").select(
            "node_id", F.col("cluster_md5").alias("cluster_id")
        )
    return member


def cluster_pairwise_predictions_at_threshold(
    nodes: DataFrame,
    predictions: DataFrame,
    settings: Settings,
    threshold_match_probability: float,
    with_md5_ids: bool = False,
) -> DataFrame:
    """Reference EP3 (/root/reference/splink/internals/linker_components/
    clustering.py:43-181): threshold the edge list, solve CC, join membership
    back onto the node table."""
    uid = settings.unique_id_column_name
    edges = predictions.where(
        F.col("match_probability") >= F.lit(threshold_match_probability)
    ).select("unique_id_l", "unique_id_r")
    member = solve_connected_components(
        nodes, edges, node_col=uid, with_md5_ids=with_md5_ids
    )
    return nodes.join(
        member.select(F.col("node_id").alias(uid), "cluster_id"), on=uid
    )


def cluster_sizes(membership: DataFrame) -> DataFrame:
    """cluster_id -> n_members (clustering.py:290-314)."""
    return membership.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )


def bridges(membership: DataFrame, edges: DataFrame,
            node_col: str = "node_id",
            edge_l: str = "unique_id_l", edge_r: str = "unique_id_r",
            max_cluster_edges: int = 200_000) -> DataFrame:
    """Bridge edges (edges whose removal disconnects their cluster).

    The reference computes bridges with igraph ON THE DRIVER over the whole
    edge list (graph_metrics.py:139-235). Here each cluster's subgraph runs
    Tarjan's bridge-finding independently inside applyInPandas — distributed
    by cluster_id, nothing collected to the driver. Clusters larger than
    `max_cluster_edges` are emitted with is_bridge=NULL (skipped, not
    exploded) — a cluster that big is itself a data-quality signal.

    Output: (cluster_id, edge_l, edge_r, is_bridge).
    """
    import pandas as pd

    cl = membership.select(F.col(node_col).alias(edge_l),
                           F.col("cluster_id"))
    e = edges.select(edge_l, edge_r).join(cl, on=edge_l)

    def find_bridges(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[[edge_l, edge_r]].copy()
        out["cluster_id"] = pdf["cluster_id"].iloc[0]
        if len(pdf) > max_cluster_edges:
            out["is_bridge"] = None
            return out[["cluster_id", edge_l, edge_r, "is_bridge"]]
        # adjacency with edge ids so a parallel edge is never a bridge
        adj: dict[str, list[tuple[str, int]]] = {}
        pairs = list(zip(pdf[edge_l], pdf[edge_r]))
        for idx, (u, v) in enumerate(pairs):
            adj.setdefault(u, []).append((v, idx))
            adj.setdefault(v, []).append((u, idx))
        disc: dict[str, int] = {}
        low: dict[str, int] = {}
        is_bridge = [False] * len(pairs)
        counter = [0]
        for root in adj:
            if root in disc:
                continue
            # iterative Tarjan: stack of (node, incoming edge id, child iter)
            stack = [(root, -1, iter(adj[root]))]
            disc[root] = low[root] = counter[0]
            counter[0] += 1
            while stack:
                node, in_edge, it = stack[-1]
                advanced = False
                for nbr, eid in it:
                    if eid == in_edge:
                        continue
                    if nbr not in disc:
                        disc[nbr] = low[nbr] = counter[0]
                        counter[0] += 1
                        stack.append((nbr, eid, iter(adj[nbr])))
                        advanced = True
                        break
                    low[node] = min(low[node], disc[nbr])
                if not advanced:
                    stack.pop()
                    if stack:
                        parent = stack[-1][0]
                        low[parent] = min(low[parent], low[node])
                        if low[node] > disc[parent]:
                            is_bridge[in_edge] = True
        # parallel edges: a duplicated (u,v) is never a bridge — the edge-id
        # trick already handles it (the second copy is a back edge)
        out["is_bridge"] = is_bridge if len(pdf) <= max_cluster_edges else None
        return out[["cluster_id", edge_l, edge_r, "is_bridge"]]

    # derive the output schema from the INPUT types: long/int node ids (the
    # compacted-long CC path) must come back out as the same type, not a
    # hardcoded string (an Arrow type mismatch otherwise fails at runtime)
    types = dict(zip(e.columns, [f.dataType.simpleString()
                                 for f in e.schema.fields]))
    schema = (f"cluster_id {types['cluster_id']}, "
              f"{edge_l} {types[edge_l]}, {edge_r} {types[edge_r]}, "
              "is_bridge boolean")
    return e.groupBy("cluster_id").applyInPandas(find_bridges, schema=schema)


def graph_metrics(membership: DataFrame, edges: DataFrame,
                  node_col: str = "node_id",
                  edge_l: str = "unique_id_l",
                  edge_r: str = "unique_id_r") -> tuple[DataFrame, DataFrame]:
    """Node + cluster graph metrics (graph_metrics.py:28-115,257-312):
    node degree; per-cluster n_nodes, n_edges, density
    (2E / N(N-1)) and centralisation (Freeman degree centralisation).
    Returns (node_metrics, cluster_metrics)."""
    endpoints = edges.select(F.col(edge_l).alias(node_col)).unionAll(
        edges.select(F.col(edge_r).alias(node_col)))
    degrees = endpoints.groupBy(node_col).agg(
        F.count(F.lit(1)).alias("node_degree"))
    node_metrics = membership.join(degrees, on=node_col, how="left") \
        .withColumn("node_degree", F.coalesce("node_degree", F.lit(0)))
    cluster_metrics = (
        node_metrics.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            (F.sum("node_degree") / 2.0).alias("n_edges"),
            F.max("node_degree").alias("_max_deg"),
            F.sum("node_degree").alias("_sum_deg"),
        )
        .select(
            "cluster_id", "n_nodes", "n_edges",
            F.when(
                F.col("n_nodes") > 1,
                2.0 * F.col("n_edges") / (F.col("n_nodes") * (F.col("n_nodes") - 1)),
            ).alias("density"),
            F.when(
                F.col("n_nodes") > 2,
                (F.col("n_nodes") * F.col("_max_deg") - F.col("_sum_deg"))
                / ((F.col("n_nodes") - 1) * (F.col("n_nodes") - 2)),
            ).alias("cluster_centralisation"),
        )
    )
    return node_metrics, cluster_metrics
