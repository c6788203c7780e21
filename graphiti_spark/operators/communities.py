"""G3-G6 — community detection (label propagation) + community tables.

Ports the reference's synchronous label propagation
(/root/reference/graphiti_core/utils/maintenance/community_operations.py:86-131):

1. every node starts in its own integer community (enumeration index; here
   the deterministic dense rank of uuid within the group),
2. each round every node adopts the edge-count-weighted plurality community
   of its neighbors — ties broken toward the LARGER community id — but only
   when the winning weight > 1; otherwise it keeps max(current, candidate),
3. repeat until no label changes — BOUNDED at MAX_LPA_ROUNDS: the
   reference's synchronous update can oscillate forever (two nodes swapping
   labels each round; its `while True` would never exit), so this port caps
   the rounds and takes the state at the cap.

The per-node neighbor projection the reference builds with one Cypher query
per node (community_operations.py:40-70) is one aggregation here:
edges.groupBy(src, dst).count() (G4).

The hierarchical LLM community summary (G5, :170-211) becomes a
deterministic concatenate-and-truncate of member names/summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_LPA_ROUNDS = 20


def neighbor_projection(edges: DataFrame) -> DataFrame:
    """G4: undirected weighted adjacency from the canonical edge table.

    edges(group_id, source_node_uuid, target_node_uuid) ->
    (group_id, u, v, w) with w = RELATES_TO edge count between the pair.
    """
    fwd = edges.select(
        "group_id",
        F.col("source_node_uuid").alias("u"),
        F.col("target_node_uuid").alias("v"),
    )
    rev = edges.select(
        "group_id",
        F.col("target_node_uuid").alias("u"),
        F.col("source_node_uuid").alias("v"),
    )
    return (
        fwd.union(rev)
        .filter(F.col("u") != F.col("v"))
        .groupBy("group_id", "u", "v")
        .agg(F.count("*").alias("w"))
    )


def label_propagation(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = MAX_LPA_ROUNDS
) -> DataFrame:
    """G3: (group_id, uuid) nodes + canonical edges -> (group_id, uuid,
    community) with integer community labels per group.

    Synchronous rounds exactly as the reference: new labels all derive from
    the previous round's map. Each round is one aggregation + join; labels
    localCheckpoint to keep lineage flat.
    """
    nbr = neighbor_projection(edges).localCheckpoint(eager=False)
    labels = nodes.select(
        "group_id",
        "uuid",
        (F.row_number().over(Window.partitionBy("group_id").orderBy("uuid")) - 1).alias(
            "label"
        ),
    ).localCheckpoint(eager=True)

    for _ in range(max_rounds):
        nbr_labels = nbr.join(
            labels.select("group_id", F.col("uuid").alias("v"), F.col("label").alias("nl")),
            on=["group_id", "v"],
        )
        # plurality with ties to the larger community id: max over
        # struct(weight, label)
        best = (
            nbr_labels.groupBy("group_id", "u", "nl")
            .agg(F.sum("w").alias("cnt"))
            .groupBy("group_id", "u")
            .agg(F.max(F.struct("cnt", F.col("nl"))).alias("best"))
            .select(
                "group_id",
                F.col("u").alias("uuid"),
                F.col("best.cnt").alias("cnt"),
                F.col("best.nl").alias("cand"),
            )
        )
        new_labels = (
            labels.join(best, on=["group_id", "uuid"], how="left")
            .select(
                "group_id",
                "uuid",
                F.when((F.col("cand").isNotNull()) & (F.col("cnt") > 1), F.col("cand"))
                .otherwise(F.greatest(F.col("label"), F.coalesce(F.col("cand"), F.col("label"))))
                .alias("label"),
                F.col("label").alias("old_label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = new_labels.select("group_id", "uuid", "label").localCheckpoint(eager=False)
        if changed == 0:
            break
    return labels.select("group_id", "uuid", F.col("label").alias("community"))


def build_community_tables(
    nodes: DataFrame, edges: DataFrame, max_rounds: int = MAX_LPA_ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """-> (communities, community_members).

    communities: uuid, name, group_id, summary, created_at — uuid is a
    content hash of the min member uuid (deterministic, resumable);
    summary = first 25 sorted member names joined (deterministic stand-in
    for the reference's hierarchical LLM summarization, G5).
    community_members: uuid, group_id, source_node_uuid (community),
    target_node_uuid (member), created_at (HAS_MEMBER edges, G2).
    """
    labels = label_propagation(nodes, edges, max_rounds)
    members = labels.join(
        nodes.select("uuid", "name", "created_at"), on="uuid"
    )
    agg = members.groupBy("group_id", "community").agg(
        F.min("uuid").alias("min_member"),
        F.sort_array(F.collect_list(F.struct("name", "uuid"))).alias("member_names"),
        F.min("created_at").alias("created_at"),
        F.count("*").alias("n_members"),
    )
    communities = agg.select(
        F.sha1(F.concat_ws("\x1f", F.lit("community"), F.col("group_id"), F.col("min_member"))).alias(
            "uuid"
        ),
        F.concat(F.lit("community of "), F.col("member_names")[0]["name"]).alias("name"),
        "group_id",
        F.concat_ws(
            ", ", F.slice(F.transform("member_names", lambda s: s["name"]), 1, 25)
        ).alias("summary"),
        "created_at",
        "community",
        "n_members",
    )
    community_members = (
        labels.join(
            communities.select("group_id", "community", F.col("uuid").alias("community_uuid")),
            on=["group_id", "community"],
        )
        .select(
            F.sha1(
                F.concat_ws("\x1f", F.lit("has_member"), F.col("community_uuid"), F.col("uuid"))
            ).alias("edge_uuid"),
            "group_id",
            F.col("community_uuid").alias("source_node_uuid"),
            F.col("uuid").alias("target_node_uuid"),
        )
    )
    return communities.drop("community", "n_members"), community_members


def attach_new_members(
    community_members: DataFrame,
    edges: DataFrame,
    new_nodes: DataFrame,
) -> DataFrame:
    """G6 incremental update (ref community_operations.py:252-340
    `determine_entity_community` + `update_community`), set-oriented: every
    node in `new_nodes` that is NOT yet a community member joins the
    plurality community among its graph neighbors' communities (ties break
    to the smaller community uuid — a deterministic stand-in for the
    reference's dict-iteration tie). Nodes with no communal neighbor stay
    unassigned, as the reference returns None.

    Returns NEW HAS_MEMBER rows (same schema as community_members) —
    existing assignments are never recomputed, which is the point: the
    streaming path appends these instead of re-running LPA per micro-batch.
    """
    bi = edges.select(
        F.col("source_node_uuid").alias("u"), F.col("target_node_uuid").alias("v")
    ).union(
        edges.select(
            F.col("target_node_uuid").alias("u"), F.col("source_node_uuid").alias("v")
        )
    )
    fresh = new_nodes.select("uuid", "group_id").join(
        community_members.select(F.col("target_node_uuid").alias("uuid")),
        on="uuid",
        how="left_anti",
    )
    nbr_comms = (
        fresh.join(bi, fresh.uuid == bi.u)
        .join(
            community_members.select(
                F.col("target_node_uuid").alias("v"),
                F.col("source_node_uuid").alias("community_uuid"),
            ),
            on="v",
        )
        .groupBy("uuid", "group_id", "community_uuid")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("uuid").orderBy(F.desc("cnt"), F.asc("community_uuid"))
    best = nbr_comms.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return best.select(
        F.sha1(
            F.concat_ws("\x1f", F.lit("has_member"), F.col("community_uuid"), F.col("uuid"))
        ).alias("edge_uuid"),
        "group_id",
        F.col("community_uuid").alias("source_node_uuid"),
        F.col("uuid").alias("target_node_uuid"),
    )
