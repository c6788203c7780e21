"""T1-T7 — edge pointer rewrite, dedup, and temporal invalidation.

- D15 pointer rewrite: triples join the name-resolution map on
  (group_id, normalized mention name) for subject and object — the
  hub-entity skew point; AQE skew-join splitting handles it, and the map
  side is broadcast when small (ref utils/bulk_utils.py:556-563).
- T1/T2 exact-fact dedup: first occurrence wins on the key
  (source, target, normalized fact); the surviving edge absorbs all
  episode uuids in chronological order
  (ref edge_operations.py:235-249, 467-478).
- T6/T7 temporal invalidation, set-based: for every edge, the earliest
  later-valid_at contradicting edge (same group/source/predicate,
  different target) sets invalid_at, subject to the disjoint-interval
  guards of resolve_edge_contradictions (ref edge_operations.py:393-423)
  and the new-edge self-expiry rule (:585-598). Sequential and set-based
  evaluation agree except on second-order arrival effects (see oracle.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark.functions.udfs import normalize_exact_col
from graphiti_spark.operators.node_dedup import det_id_col


def rewrite_pointers(raw_triples: DataFrame, name_resolution: DataFrame) -> DataFrame:
    """D15: subject/object surface names -> canonical node uuids."""
    subj_map = name_resolution.select(
        "group_id",
        F.col("norm_exact").alias("subj_norm"),
        F.col("canonical_id").alias("source_node_uuid"),
    )
    obj_map = name_resolution.select(
        "group_id",
        F.col("norm_exact").alias("obj_norm"),
        F.col("canonical_id").alias("target_node_uuid"),
    )
    t = raw_triples.withColumn("subj_norm", normalize_exact_col(F.col("subject"))).withColumn(
        "obj_norm", normalize_exact_col(F.col("object"))
    )
    return (
        t.join(subj_map, on=["group_id", "subj_norm"])
        .join(obj_map, on=["group_id", "obj_norm"])
        .filter(F.col("source_node_uuid") != F.col("target_node_uuid"))
        .drop("subj_norm", "obj_norm")
    )


def dedup_edges(resolved_triples: DataFrame) -> DataFrame:
    """T1/T2: first-wins on (group, src, dst, normalized fact); merge episode
    provenance chronologically. Winner = earliest (ep_valid_at, episode_uuid,
    triple_idx), matching the oracle's arrival order.

    The grouping key uses xxhash64 of the normalized fact, not the ~100-byte
    string — the fact text still reaches the output via the winner struct and
    norm_fact is recomputed from it post-aggregation, so results are
    identical (modulo 2^-64 hash collisions) while the shuffle moves ~40%
    fewer bytes — this stage is memory-bandwidth-bound at scale."""
    t = resolved_triples.withColumn(
        "fact_key", F.xxhash64(normalize_exact_col(F.col("fact")))
    )
    winner = F.min(
        F.struct("ep_valid_at", "episode_uuid", "triple_idx", "predicate", "fact", "valid_at", "invalid_at")
    ).alias("w")
    episodes = F.array_distinct(
        F.transform(
            F.array_sort(F.collect_set(F.struct("ep_valid_at", "episode_uuid"))),
            lambda s: s.episode_uuid,
        )
    ).alias("episodes")
    return (
        t.groupBy("group_id", "source_node_uuid", "target_node_uuid", "fact_key")
        .agg(winner, episodes)
        .withColumn("norm_fact", normalize_exact_col(F.col("w.fact")))
        .select(
            det_id_col(
                F.lit("edge"),
                F.col("group_id"),
                F.col("source_node_uuid"),
                F.col("w.predicate"),
                F.col("target_node_uuid"),
                F.col("norm_fact"),
            ).alias("uuid"),
            "group_id",
            "source_node_uuid",
            "target_node_uuid",
            F.col("w.predicate").alias("name"),
            F.col("w.fact").alias("fact"),
            "norm_fact",
            "episodes",
            F.col("w.ep_valid_at").alias("created_at"),
            F.col("w.valid_at").alias("valid_at"),
            F.col("w.invalid_at").alias("invalid_at"),
            # arrival-order tiebreaks (winner's episode + in-episode triple
            # position): consumed by invalidate_contradictions to reproduce
            # the oracle's sequential arrival semantics, dropped there
            F.col("w.episode_uuid").alias("arr_episode"),
            F.col("w.triple_idx").alias("arr_idx"),
        )
    )


EDGE_COSINE_THRESHOLD = 0.6  # ref utils/bulk_utils.py:425


ENDPOINT_PAIR_CAP = 10_000  # hub guard: same shape as node_dedup.LSH_BUCKET_CAP


def near_duplicate_edge_pairs(
    edges: DataFrame,
    cosine_threshold: float = EDGE_COSINE_THRESHOLD,
    endpoint_pair_cap: int | None = None,
    with_tokens: bool = True,
) -> DataFrame:
    """T4 candidate generation (ref utils/bulk_utils.py:416-510): pairs of
    edges between the SAME directed endpoint pair (ref :446-450 skips any
    candidate whose source or target differs) whose facts share a word (the
    reference's "approximate BM25", :451-457) OR whose fact embeddings have
    cosine >= 0.6 (:460-465).

    Output: a_uuid, b_uuid, same_tokens BOOLEAN, cos DOUBLE. The endpoint-
    pair join key bounds the quadratic blowup exactly as the reference's
    per-pair candidate loop does. `endpoint_pair_cap`: endpoint pairs with
    more parallel (already exact-deduped) edges than the cap are skipped
    outright — at web scale a hub pair with 10^6 distinct facts would
    otherwise emit 10^12 candidate rows; skipping mirrors how
    node_dedup.LSH_BUCKET_CAP makes blocking deliberately approximate
    (exact-fact dedup has already run for those edges).
    """
    from graphiti_spark.search import _dot, quantize_col

    has_vec = "fact_embedding" in edges.columns
    # fact rides along only when a consumer needs it: token arrays, or the
    # embed-on-demand path below — the cosine-only caller with embeddings
    # present (the pipeline's canonical map) never moves the string at all
    need_fact = with_tokens or not has_vec
    # the directed endpoint-pair block key (group_id, source, target) is
    # ~90 B of uuid-hex strings; every downstream exchange keys on it, so it
    # travels as one xxhash64 instead. A 2^-64 block-key collision merges
    # two endpoint blocks — extra CANDIDATES whose cosine/token judgment
    # still decides, the same accepted-risk class as dedup_edges' fact_key.
    bk = F.xxhash64("group_id", "source_node_uuid", "target_node_uuid").alias("bk")
    base = edges.select(
        "uuid",
        bk,
        *(["fact"] if need_fact else []),
        *(["fact_embedding"] if has_vec else []),
    )
    # singleton endpoint pairs can never produce a candidate — drop them
    # BEFORE any per-edge feature work. In webtext the overwhelming
    # majority of endpoint pairs hold exactly one (already exact-deduped)
    # edge, so this one aggregation shrinks the tokenize/quantize/embed
    # work from |edges| to |edges in multi-edge blocks| (~13% on the 400k-
    # page corpus). The block list is tiny relative to the edge table, so
    # AQE turns this into a broadcast join (64 MB session threshold) and
    # the edge side is never shuffled.
    sizes = edges.groupBy(bk).count()
    multi_blocks = sizes.filter(F.col("count") >= 2)
    if endpoint_pair_cap is not None:
        multi_blocks = multi_blocks.filter(F.col("count") <= endpoint_pair_cap)
    base = base.join(multi_blocks.drop("count"), on="bk")
    if has_vec:
        # quantize AFTER the block restriction: the 128-element transform is
        # interpreted (higher-order functions skip codegen), so running it
        # on the full table costs ~8x the surviving-block work (measured
        # 68s -> ~20s on the 400k-page corpus at local[8])
        base = base.withColumn("qv", quantize_col(F.col("fact_embedding"))).drop(
            "fact_embedding"
        )
    else:
        # embeddings only for the surviving candidates (same kernel the
        # pipeline uses everywhere; bit-identical to the oracle twin). The
        # explicit repartition keeps the pandas UDF spread over every core
        # — AQE would coalesce the small post-join exchange and serialize
        # the Python stage.
        from graphiti_spark.functions.udfs import embed_udf

        par = edges.sparkSession.sparkContext.defaultParallelism * 2
        base = base.repartition(par).withColumn(
            "qv", quantize_col(embed_udf(F.col("fact")))
        )
    # `with_tokens=False` callers (the cosine-only duplicate judgment in
    # merge_near_duplicate_edges) skip the token arrays entirely — they are
    # the widest per-row payload in the self-join shuffle
    if with_tokens:
        base = base.withColumn(
            "toks",
            F.array_distinct(
                F.filter(F.split(F.lower(F.col("fact")), r"\s+"), lambda x: x != "")
            ),
        )
    else:
        base = base.withColumn("toks", F.lit(None).cast("array<string>"))
    base = base.drop("fact")
    # norms computed once per EDGE here, not once per PAIR below: the pair
    # join then evaluates a single integer dot per candidate instead of 3
    base = base.withColumn("qn", F.sqrt(_dot(F.col("qv"), F.col("qv")).cast("double")))
    a = base.select(
        "bk",
        F.col("uuid").alias("a_uuid"), F.col("toks").alias("a_toks"),
        F.col("qv").alias("a_qv"), F.col("qn").alias("a_qn"),
    )
    b = base.select(
        "bk",
        F.col("uuid").alias("b_uuid"), F.col("toks").alias("b_toks"),
        F.col("qv").alias("b_qv"), F.col("qn").alias("b_qn"),
    )
    pairs = a.join(b, on="bk").filter(F.col("a_uuid") < F.col("b_uuid"))
    overlap = F.arrays_overlap("a_toks", "b_toks")
    # zero-norm guard: 0/0 would be NaN, and Spark SQL sorts NaN above every
    # number so `cos >= threshold` would be TRUE — the oracle twin
    # (_quantized_cosine) returns 0.0 for zero norms, so gate the expression
    # on both norms being positive (null otherwise; null fails the filter)
    cos = F.when(
        F.col("a_qv").isNotNull() & F.col("b_qv").isNotNull()
        & (F.col("a_qn") > 0) & (F.col("b_qn") > 0),
        _dot(F.col("a_qv"), F.col("b_qv")).cast("double")
        / (F.col("a_qn") * F.col("b_qn")),
    )
    keep = (
        (F.coalesce(overlap, F.lit(False)) | (F.col("cos") >= cosine_threshold))
        if with_tokens
        else (F.col("cos") >= cosine_threshold)
    )
    return (
        pairs.withColumn("same_tokens", overlap)
        .withColumn("cos", cos)
        .filter(keep)
        .select("a_uuid", "b_uuid", "same_tokens", "cos")
    )


# above this many judged pairs the driver union-find hands off to
# distributed CC; 2M uuid pairs collect in ~250 MB and union-find in
# seconds, and that serial cost is identical at every cluster size, while
# iterative distributed CC at this size costs several shuffle rounds that
# scale WORSE than the serial constant (measured on the 400k-page corpus)
DRIVER_CC_CACHED_MAX = 2_000_000


def near_dup_canonical_map(
    edges: DataFrame,
    cosine_threshold: float = EDGE_COSINE_THRESHOLD,
    known_edge_count: int | None = None,
) -> tuple[DataFrame, int]:
    """T5/T10 judgment + union-find, WITHOUT the final rewrite: returns
    (canonical map (id, canonical), pair count). Split out from
    `merge_near_duplicate_edges` because the map depends only on columns
    temporal invalidation never touches (uuid, endpoints, fact embeddings),
    so the pipeline computes it from the deduped table CONCURRENTLY with
    invalidation and applies it to the invalidated table afterwards.

    Scale-adaptive on the pair DAG itself, not only on the CC algorithm:

    - small input (known_edge_count <= SALT_FAST_PATH_MAX, or unknown): one
      probe collect both fetches the pair list for the exact driver
      union-find and yields the pair count — the whole stage is one job.
    - large input: the probe would be wasted — a pair volume above the
      probe cap means its limit() collect is thrown away and the full DAG
      re-runs for persist+count (the limit's first wave is parallel now —
      session.py sets spark.sql.limit.initialNumPartitions — but the
      double execution remains). Instead
      the pair DAG is persisted and counted ONCE at full parallelism;
      the union-find then reads the cache — collected to the driver below
      DRIVER_CC_CACHED_MAX (a cache scan + serial union-find, identical
      cost at every cluster size), distributed min-label CC above it.
    """
    from graphiti_spark.operators.connected_components import (
        DRIVER_CC_MAX_PAIRS,
        _distributed_cc,
        _driver_cc_df,
    )

    pairs = (
        near_duplicate_edge_pairs(
            edges, cosine_threshold, ENDPOINT_PAIR_CAP, with_tokens=False
        )
        .filter(F.col("cos") >= cosine_threshold)
        .select(F.col("a_uuid").alias("a"), F.col("b_uuid").alias("b"))
    )
    if known_edge_count is not None and known_edge_count > SALT_FAST_PATH_MAX:
        pairs = pairs.persist()
        n_pairs = pairs.count()
        if n_pairs <= DRIVER_CC_CACHED_MAX:
            rows = pairs.collect()
            pairs.unpersist()
            return (
                _driver_cc_df(edges.sparkSession, [(r["a"], r["b"]) for r in rows]),
                n_pairs,
            )
        canon = _distributed_cc(pairs)
        # _distributed_cc checkpointed its output; the pair cache is consumed
        pairs.unpersist()
        return canon, n_pairs

    sample = pairs.limit(DRIVER_CC_MAX_PAIRS + 1).collect()
    if len(sample) <= DRIVER_CC_MAX_PAIRS:
        return (
            _driver_cc_df(edges.sparkSession, [(r["a"], r["b"]) for r in sample]),
            len(sample),
        )
    pairs = pairs.persist()
    n_pairs = pairs.count()
    canon = _distributed_cc(pairs)
    pairs.unpersist()
    return canon, n_pairs


def merge_near_duplicate_edges(
    edges: DataFrame,
    cosine_threshold: float = EDGE_COSINE_THRESHOLD,
) -> DataFrame:
    """T5/T10: collapse near-duplicate edges (ref utils/bulk_utils.py:416-510
    `dedupe_edges_bulk`): candidate pairs from `near_duplicate_edge_pairs`,
    judged duplicates when fact-embedding cosine >= 0.6 (the deterministic
    replacement of the reference's LLM `resolve_extracted_edge` judgment —
    north_star is LLM-free), then union-find with the lexicographically
    smallest uuid as canonical (ref `compress_uuid_map`, :513-550). The
    canonical edge keeps its own scalar fields (fact, dates — as the
    reference keeps the canonical EntityEdge object) and absorbs every
    member's episode provenance, ordered by member (created_at, uuid).

    Embeds facts internally when no `fact_embedding` column is present.
    Schema is preserved; merged-away edges disappear.
    """
    canon, n_pairs = near_dup_canonical_map(edges, cosine_threshold)
    return apply_edge_merge(edges, canon, n_pairs)


def apply_edge_merge(edges: DataFrame, canon: DataFrame, n_pairs: int) -> DataFrame:
    """Rewrite step of T5/T10: apply a canonical map (from
    `near_dup_canonical_map`) to the edge table — merged-away edges
    disappear, each canonical edge absorbs its members' episode provenance
    in member (created_at, uuid) order."""
    out_cols = edges.columns
    ep_merge = F.array_distinct(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("created_at", "uuid", "episodes"))),
                lambda s: s.episodes,
            )
        )
    ).alias("_merged_episodes")

    # The canonical map covers ONLY component members (the min_uuid_map
    # contract, self-mappings included) — at web scale a small fraction of
    # the edge table. When it fits a broadcast, the big table is never
    # shuffled AND is scanned exactly once: a narrow scan collects member
    # episodes (small aggregate), then a single full-width pass left-joins
    # the two broadcast maps, drops merged-away members, and swaps in the
    # merged provenance. (An earlier 3-scan union formulation was
    # row-identical but memory-bandwidth-bound — the full-width scan, not
    # the joins, is the cost at scale.)
    if n_pairs <= 2_000_000:
        canon_b = F.broadcast(canon)
        member_eps = edges.join(canon_b, edges.uuid == canon.id, how="inner").select(
            "canonical", "created_at", "uuid", "episodes"
        )
        merged_eps = F.broadcast(
            member_eps.groupBy(F.col("canonical").alias("comp")).agg(ep_merge)
        )
        return (
            edges.join(
                canon_b.withColumnRenamed("id", "uuid"), on="uuid", how="left"
            )
            .join(merged_eps, F.col("uuid") == F.col("comp"), how="left")
            .filter(F.col("canonical").isNull() | (F.col("canonical") == F.col("uuid")))
            .withColumn("episodes", F.coalesce("_merged_episodes", "episodes"))
            .select(*out_cols)
        )

    # huge component maps: classic shuffle path
    tagged = (
        edges.join(canon, edges.uuid == canon.id, how="left")
        .withColumn("comp", F.coalesce(F.col("canonical"), F.col("uuid")))
        .drop("id", "canonical")
    )
    merged_eps = tagged.groupBy("comp").agg(ep_merge)
    return (
        edges.join(merged_eps, edges.uuid == merged_eps.comp)
        .withColumn("episodes", F.col("_merged_episodes"))
        .select(*out_cols)
    )


SALT_FAST_PATH_MAX = 1_000_000  # below this, plain join + recompute wins

# invalidation maps up to this many rows are broadcast when applied, so the
# full-width edge table never crosses an exchange for the final assembly
INV_MAP_BROADCAST_MAX = 4_000_000


def invalidation_map(
    edges: DataFrame,
    num_salts: int = 8,
    hot_threshold: int = 10_000,
    known_edge_count: int | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """T6/T7 interval algebra over contradicting-edge pairs — the exact
    set-based form of the reference's sequential per-arrival rules
    (ref edge_operations.py:393-423 contradiction loop, :585-598 new-edge
    self-expiry), reproduced against an explicit arrival order so the
    result is row-identical to the chronological oracle (oracle.py).

    Returns the per-uuid invalidation MAP (uuid, _self_min, _later_min) —
    only edges with at least one contradiction appear — WITHOUT touching
    the edge table itself; `apply_invalidation` folds it back in. Splitting
    the two lets the pipeline keep the map (small) materialized while the
    full-width edge table stays lazy all the way to the final write.

    Contradiction domain (deterministic replacement of the reference's LLM
    judgment, SURVEY.md §2.4 T5): same (group_id, source, predicate),
    different target, both valid_at non-null. Arrival order is
    (created_at, arr_episode, arr_idx) when dedup_edges' tiebreak columns
    are present, else (valid_at, uuid). Arrival ties are impossible:
    distinct deduped edges have distinct winner (episode, triple_idx), and
    the fallback includes the unique uuid — so the pair set carries a
    single exact `earlier` boolean instead of two arrival structs (the
    struct payload, with its episode-uuid strings, dominated the
    checkpoint size of the ~5-pairs-per-edge pair set at scale).

    Per edge E with contradiction set C:
    1. post-arrival invalid A(E) = E's extracted invalid_at if set (an
       extracted end date is authoritative at arrival — ref :581-583 sets
       expired and skips self-expiry); else min{c.valid : c arrived before
       E, c.valid > E.valid} (self-expiry, :585-598 — no guards).
    2. later-arrived contradictions truncate further: min{c.valid :
       c arrived after E, c.valid > E.valid, A(c) null or > E.valid}
       (the :402-413 disjointness guard, evaluated against c's own
       post-arrival invalid exactly as the sequential loop sees it).
    3. invalid_at = least(A(E), that minimum); expired_at = now iff set.

    The self-join key (group_id, source, predicate) is dominated by hub
    entities, so it goes through the explicit salted join (operators/skew)
    with a SAMPLED hot-key probe: keys with more than `hot_threshold`
    edges are split over `num_salts` shuffle partitions; the result is
    row-identical to the plain join. The contradicting-pair set is
    localCheckpointed (one job) because two aggregation phases consume it;
    it is tiny relative to the edge table (only same-key different-target
    pairs with ordered valid_at survive).

    Scale-adaptive (same pattern as connected_components' driver path):
    when the caller proves the input is small (`known_edge_count` below
    SALT_FAST_PATH_MAX) the hot-key probe job and the pair checkpoint job
    are skipped — a plain join recomputed by both phases is cheaper than
    two extra job barriers at that size, and AQE's skew splitting still
    covers it. The result is row-identical on every path.
    """
    from graphiti_spark.operators.skew import salted_join

    has_arr = "arr_episode" in edges.columns and "arr_idx" in edges.columns
    small = known_edge_count is not None and known_edge_count <= SALT_FAST_PATH_MAX

    # The contradiction domain (group_id, source, predicate) is ~90 B of
    # mostly uuid-hex strings and keys the window AND the self-join, so it
    # travels as one xxhash64; the target uuid is only ever compared for
    # inequality, so it travels hashed too. A 2^-64 key collision could
    # alias two domains (a false contradiction pair) or two targets (a
    # missed one) — the same accepted-risk class as dedup_edges' fact_key;
    # within a true domain, row_number ranks keep their relative order even
    # if a collision interleaves two domains in one window partition.
    kh_expr = F.xxhash64("group_id", "source_node_uuid", "name")
    kh = kh_expr.alias("kh")

    # arrival ORDER is all the algebra needs, and comparisons only ever
    # happen between edges sharing the join key — so a per-key row_number
    # over the arrival tuple replaces the tuple itself. The self-join's
    # two sides then project from ONE window child: a single narrow
    # exchange (reused by both sides) instead of two exchanges dragging
    # episode-uuid strings, and `earlier` is an integer compare. Ranks are
    # deterministic: distinct deduped edges have distinct winner
    # (episode, triple_idx), and the fallback order ends in the unique uuid.
    order_cols = (
        [F.col("created_at"), F.col("arr_episode"), F.col("arr_idx")]
        if has_arr
        else [F.col("valid_at"), F.col("uuid")]
    )
    base = edges.select(
        "uuid", kh, F.xxhash64("target_node_uuid").alias("dh"), "valid_at",
        F.row_number()
        .over(Window.partitionBy(kh_expr).orderBy(*order_cols))
        .alias("arr_rank"),
    )
    e2 = base.select(
        "kh",
        F.col("uuid").alias("uuid2"),
        F.col("dh").alias("dh2"),
        F.col("valid_at").alias("valid2"),
        F.col("arr_rank").alias("rank2"),
    )
    left = base
    if small:
        joined = left.join(e2, on="kh", how="inner")
    else:
        joined = salted_join(
            left, e2, on=["kh"], salt_col="uuid",
            num_salts=num_salts, hot_threshold=hot_threshold,
            known_left_count=known_edge_count,
            probe_sample=0.02,
            probe_frame=edges.select(kh),
        )
    pairs = joined.filter(
        (F.col("dh") != F.col("dh2"))
        & F.col("valid2").isNotNull()
        & F.col("valid_at").isNotNull()
        & (F.col("valid2") > F.col("valid_at"))
    ).select(
        "uuid", "uuid2", "valid_at", "valid2",
        (F.col("rank2") < F.col("arr_rank")).alias("earlier"),
    )
    # two aggregation phases read this; materialize so the (salted) join
    # runs once — paying one extra job barrier beats re-running the window
    # + self-join chain for phase 2 at every size (the pair set is tiny
    # relative to the edge table on both paths). With a cache_registry
    # (the pipeline's per-run cache list) the pairs persist through the
    # caller's release() — the form streaming's per-micro-batch soak
    # guarantee needs; standalone callers get a localCheckpoint whose
    # blocks the JVM releases on GC.
    if cache_registry is not None:
        pairs = pairs.persist()
        cache_registry.append(pairs)
        pairs.count()
    else:
        pairs = pairs.localCheckpoint(eager=True)

    # phase 1 — self-expiry: min later-valid among EARLIER-arrived
    # contradictions; applies only when no extracted invalid_at exists
    self_min = (
        pairs.filter(F.col("earlier"))
        .groupBy("uuid")
        .agg(F.min("valid2").alias("_self_min"))
    )
    # A(c) for the phase-2 guard: only edges with a non-null post-arrival
    # invalid matter (null passes the guard), so this stays a small table
    ext = edges.filter(F.col("invalid_at").isNotNull()).select(
        "uuid", F.col("invalid_at").alias("_ext")
    )
    a_map = (
        ext.join(self_min, on="uuid", how="full")
        .select("uuid", F.coalesce("_ext", "_self_min").alias("_a"))
    )

    # phase 2 — later-arrived contradictions, guarded by A(c)
    later_min = (
        pairs.filter(~F.col("earlier"))
        .join(
            a_map.select(F.col("uuid").alias("uuid2"), F.col("_a").alias("_a2")),
            on="uuid2",
            how="left",
        )
        .filter(F.col("_a2").isNull() | (F.col("_a2") > F.col("valid_at")))
        .groupBy("uuid")
        .agg(F.min("valid2").alias("_later_min"))
    )
    return self_min.join(later_min, on="uuid", how="full")


def apply_invalidation(
    edges: DataFrame,
    inv_map: DataFrame,
    now_ts,
    broadcast_map: bool = False,
) -> DataFrame:
    """Fold an `invalidation_map` back into the edge table: one left join
    (broadcast when the caller knows the map is small — the full-width
    edge table then never crosses an exchange) + the invalid_at/expired_at
    column algebra. Stays LAZY: callers chain the near-dup merge and the
    final write on top without materializing the intermediate."""
    m = F.broadcast(inv_map) if broadcast_map else inv_map
    out = (
        edges.join(m, on="uuid", how="left")
        .withColumn(
            "invalid_at",
            F.least(F.coalesce("invalid_at", "_self_min"), F.col("_later_min")),
        )
        .drop("_self_min", "_later_min")
        .withColumn(
            "expired_at",
            F.when(F.col("invalid_at").isNotNull(), F.lit(now_ts)).otherwise(
                F.lit(None).cast("timestamp")
            ),
        )
    )
    if "arr_episode" in edges.columns:
        out = out.drop("arr_episode", "arr_idx")
    return out


def invalidate_contradictions(
    edges: DataFrame,
    now_ts,
    num_salts: int = 8,
    hot_threshold: int = 10_000,
    known_edge_count: int | None = None,
) -> DataFrame:
    """T6/T7 temporal invalidation — see `invalidation_map` for the full
    algebra and `apply_invalidation` for the fold-back. This wrapper keeps
    the original one-call contract (used by the small-batch pipeline path,
    add_triplets, and the oracle-parity tests)."""
    inv = invalidation_map(edges, num_salts, hot_threshold, known_edge_count)
    return apply_invalidation(edges, inv, now_ts)


RELATED_EDGE_LIMIT = 10  # ref search/search_config.py DEFAULT_SEARCH_LIMIT


COSINE_CAND_BLOCKS = 8  # hub-group grid width for the cogrouped cosine leg


def _blocked_cosine_frames(
    new_edges: DataFrame, existing_edges: DataFrame, n_blocks: int
):
    """Cogroup inputs for the hybrid-candidate cosine leg, gridded so a hub
    group never lands in ONE pandas task: the existing-edge (candidate)
    side splits into `n_blocks` disjoint hash blocks per group, the query
    side replicates across all blocks. Cogrouping on (group_id, _blk)
    bounds single-task memory/CPU at O(|group| / n_blocks * |q_group|)
    while the union over blocks is EXACTLY the unblocked pair set (each
    candidate lives in exactly one block). NULL/empty embeddings are
    dropped on both sides — the pre-cogroup JVM expression this leg
    replaced produced NULL cosine for them, which the >= min_score filter
    discarded; numpy would instead crash on the ragged array."""
    vec_ok = F.col("fact_embedding").isNotNull() & (F.size("fact_embedding") > 0)
    q = (
        new_edges.select("uuid", "group_id", "fact_embedding")
        .filter(vec_ok)
        .withColumn(
            "_blk", F.explode(F.array(*[F.lit(i) for i in range(n_blocks)]))
        )
    )
    c = (
        existing_edges.select("uuid", "group_id", "fact_embedding")
        .filter(vec_ok)
        .withColumn("_blk", F.pmod(F.xxhash64("uuid"), F.lit(n_blocks)).cast("int"))
    )
    return q, c


def per_episode_edge_candidates(
    new_edges: DataFrame,
    existing_edges: DataFrame,
    k: int = RELATED_EDGE_LIMIT,
    cosine_blocks: int = COSINE_CAND_BLOCKS,
) -> DataFrame:
    """T3 per-episode candidate generation (ref utils/maintenance/
    edge_operations.py:256-296): for each newly extracted edge, hybrid-
    search (bm25 + cosine, RRF-fused — EDGE_HYBRID_SEARCH_RRF, ref
    search/search_config_recipes.py:111) the existing graph's edges with
    the new fact as the query, two ways:

      restricted=true  — candidates limited to existing edges between the
                         same directed (source, target) endpoints (the
                         reference's get_between_nodes valid-edges filter,
                         edges.py:368) -> dedup/resolution candidates;
      restricted=false — whole-group candidates -> invalidation candidates.

    Whole-batch and set-oriented where the reference loops one DB query per
    extracted edge: one tokenization of each side, one term join for every
    query at once, one per-group embedding join — a batch of N new edges
    costs the same number of Spark jobs as a batch of 1. BM25 statistics
    (n_docs, avgdl, df) are corpus-wide like the reference's single Lucene
    fulltext index, with the group restriction applied to candidates, and
    stay inside the plan (1-row aggregate cross-join) so no driver action
    is spent on them. Cosine keeps the reference's DEFAULT_MIN_SCORE gate;
    each method contributes its top 2k ranks per scope (ref search.py:205
    oversample) before RRF.

    Requires `fact_embedding` on both sides for the cosine leg (absent ->
    bm25-only, like a reference deployment without an embedder). Output:
    q_uuid, cand_uuid, restricted, rrf_x1e6 (score * 1e6, bigint —
    engine-exact), rank — ties broken by ascending cand_uuid.
    """
    from graphiti_spark.search import (
        DEFAULT_MIN_SCORE,
        _dot,
        bm25_multi_scores,
        quantize_col,
    )

    have_vec = (
        "fact_embedding" in new_edges.columns
        and "fact_embedding" in existing_edges.columns
    )
    qmeta = new_edges.select(
        F.col("uuid").alias("q_uuid"),
        F.col("group_id").alias("q_group"),
        F.col("source_node_uuid").alias("q_src"),
        F.col("target_node_uuid").alias("q_dst"),
    )
    cmeta = existing_edges.select(
        F.col("uuid").alias("cand_uuid"),
        F.col("group_id").alias("c_group"),
        F.col("source_node_uuid").alias("c_src"),
        F.col("target_node_uuid").alias("c_dst"),
    )

    bm = bm25_multi_scores(
        existing_edges.select(F.col("uuid").alias("doc"), "fact"),
        new_edges.select(F.col("uuid").alias("q"), "fact"),
    ).select(F.col("q").alias("q_uuid"), F.col("doc").alias("cand_uuid"), "bm")

    if have_vec:
        # cosine leg: cogrouped Arrow batches, one numpy int64 matmul per
        # group, instead of |q| x |cand| interpreted 64-element aggregate
        # expressions in a JVM join (measured ~4x on the driver-entry
        # corpus). Quantization is the numpy twin of search.quantize_col
        # (sign * floor(|x|*1000 + 0.5) = Spark round-half-up to smallint),
        # the dot is exact in int64, and the float64 norm/divide matches
        # the JVM double arithmetic op-for-op — bit-identical cos values,
        # as the DuckDB oracle requires. Task cells are (group, block): the
        # candidate side grids into `cosine_blocks` hash blocks inside each
        # group (_blocked_cosine_frames), so a hub group spreads over
        # n_blocks tasks and per-task memory is O(|group|/n_blocks * dim).
        import numpy as np
        import pandas as pd

        min_score = DEFAULT_MIN_SCORE

        def _cos_group(key, qdf: pd.DataFrame, cdf: pd.DataFrame):
            if len(qdf) == 0 or len(cdf) == 0:
                return pd.DataFrame({"q_uuid": [], "cand_uuid": [], "cos": []})
            # belt over the DataFrame-side isNotNull filter: a null/empty
            # vector that slipped through (schema drift) must degrade to
            # "no match", not crash the task on a ragged np.array
            qdf = qdf[qdf.fact_embedding.map(lambda v: v is not None and len(v) > 0)]
            cdf = cdf[cdf.fact_embedding.map(lambda v: v is not None and len(v) > 0)]
            if len(qdf) == 0 or len(cdf) == 0:
                return pd.DataFrame({"q_uuid": [], "cand_uuid": [], "cos": []})

            def quant(col):
                m = np.array([np.asarray(v, dtype=np.float64) for v in col])
                return (np.sign(m) * np.floor(np.abs(m) * 1000.0 + 0.5)).astype(np.int64)

            q = quant(qdf["fact_embedding"])
            c = quant(cdf["fact_embedding"])
            qn = np.sqrt((q * q).sum(axis=1).astype(np.float64))
            cn = np.sqrt((c * c).sum(axis=1).astype(np.float64))
            dots = (q @ c.T).astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (qn[:, None] * cn[None, :])
            ok = (qn[:, None] > 0) & (cn[None, :] > 0) & (cos >= min_score)
            qi, ci = np.nonzero(ok)
            return pd.DataFrame(
                {
                    "q_uuid": qdf["uuid"].to_numpy()[qi],
                    "cand_uuid": cdf["uuid"].to_numpy()[ci],
                    "cos": cos[qi, ci],
                }
            )

        qb, cb = _blocked_cosine_frames(new_edges, existing_edges, cosine_blocks)
        cs = (
            qb.groupBy("group_id", "_blk")
            .cogroup(cb.groupBy("group_id", "_blk"))
            .applyInPandas(_cos_group, "q_uuid string, cand_uuid string, cos double")
        )
        pairs = bm.join(cs, on=["q_uuid", "cand_uuid"], how="full_outer")
    else:
        pairs = bm.withColumn("cos", F.lit(None).cast("double"))

    pairs = (
        pairs.join(qmeta, on="q_uuid")
        .join(cmeta, on="cand_uuid")
        .filter(F.col("q_group") == F.col("c_group"))
        .withColumn(
            "endpoint_match",
            (F.col("q_src") == F.col("c_src")) & (F.col("q_dst") == F.col("c_dst")),
        )
        .select("q_uuid", "cand_uuid", "bm", "cos", "endpoint_match")
    )

    def _scope(subset: DataFrame, restricted: bool) -> DataFrame:
        wb = Window.partitionBy("q_uuid").orderBy(F.desc("bm"), F.asc("cand_uuid"))
        wc = Window.partitionBy("q_uuid").orderBy(F.desc("cos"), F.asc("cand_uuid"))
        parts = (
            subset.filter(F.col("bm").isNotNull())
            .withColumn("r", F.row_number().over(wb))
            .filter(F.col("r") <= 2 * k)
            .select("q_uuid", "cand_uuid", (F.lit(1.0) / F.col("r")).alias("part"))
        ).unionByName(
            subset.filter(F.col("cos").isNotNull())
            .withColumn("r", F.row_number().over(wc))
            .filter(F.col("r") <= 2 * k)
            .select("q_uuid", "cand_uuid", (F.lit(1.0) / F.col("r")).alias("part"))
        )
        fused = parts.groupBy("q_uuid", "cand_uuid").agg(F.sum("part").alias("score"))
        wr = Window.partitionBy("q_uuid").orderBy(F.desc("score"), F.asc("cand_uuid"))
        return (
            fused.withColumn("rank", F.row_number().over(wr))
            .filter(F.col("rank") <= k)
            .select(
                "q_uuid",
                "cand_uuid",
                F.lit(restricted).alias("restricted"),
                F.round(F.col("score") * 1e6).cast("long").alias("rrf_x1e6"),
                "rank",
            )
        )

    # four consumers read the pair set (2 scopes x {bm25, cosine} branches);
    # without a checkpoint the whole candidate DAG — term join, cogrouped
    # matmul, meta joins — executes four times per action. Lazy local
    # checkpoint: materialized by the first action, blocks GC-released.
    pairs = pairs.localCheckpoint(eager=False)
    return _scope(pairs, False).unionByName(
        _scope(pairs.filter(F.col("endpoint_match")), True)
    )
