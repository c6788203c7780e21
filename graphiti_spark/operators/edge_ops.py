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

from pyspark.sql import DataFrame
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
    triple_idx), matching the oracle's arrival order."""
    t = resolved_triples.withColumn("norm_fact", normalize_exact_col(F.col("fact")))
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
        t.groupBy("group_id", "source_node_uuid", "target_node_uuid", "norm_fact")
        .agg(winner, episodes)
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
        )
    )


def invalidate_contradictions(edges: DataFrame, now_ts) -> DataFrame:
    """T6/T7 interval algebra over contradicting-edge pairs.

    Contradiction domain (deterministic replacement of the reference's LLM
    judgment, SURVEY.md §2.4 T5): same (group_id, source, predicate),
    different target. For each edge, invalid_at becomes the minimum
    valid_at among later contradicting edges that pass the disjointness
    guards; expired_at = now whenever invalid_at is set.
    """
    e2 = edges.select(
        "group_id",
        F.col("source_node_uuid").alias("src2"),
        F.col("name").alias("name2"),
        F.col("target_node_uuid").alias("dst2"),
        F.col("valid_at").alias("valid2"),
        F.col("invalid_at").alias("invalid2"),
    )
    contradicted = (
        edges.join(
            e2,
            on=[
                edges.group_id == e2.group_id,
                edges.source_node_uuid == e2.src2,
                edges.name == e2.name2,
                edges.target_node_uuid != e2.dst2,
                e2.valid2.isNotNull(),
                edges.valid_at.isNotNull(),
                e2.valid2 > edges.valid_at,
                # guard: intervals not already disjoint (ref :402-413)
                edges.invalid_at.isNull() | (edges.invalid_at > e2.valid2),
                e2.invalid2.isNull() | (e2.invalid2 > edges.valid_at),
            ],
        )
        .groupBy(F.col("uuid").alias("c_uuid"))
        .agg(F.min("valid2").alias("contradicted_at"))
    )
    out = (
        edges.join(contradicted, edges.uuid == contradicted.c_uuid, how="left")
        .drop("c_uuid")
        .withColumn("invalid_at", F.least("invalid_at", "contradicted_at"))
        .drop("contradicted_at")
        .withColumn(
            "expired_at",
            F.when(F.col("invalid_at").isNotNull(), F.lit(now_ts)).otherwise(
                F.lit(None).cast("timestamp")
            ),
        )
    )
    return out
