"""E5/E6 — node/edge attribute + summary generation (deterministic).

The reference fills a <=250-word node summary and custom-typed attributes
with a small-model LLM call per node
(/root/reference/graphiti_core/utils/maintenance/node_operations.py:402-506,
prompts/extract_nodes.py:251-310; edge-side edge_operations.py:547-562).
The deterministic replacement summarizes each entity from the facts it
participates in: the earliest `max_facts` distinct facts, chronological,
truncated to `max_words` words — computed entirely JVM-side (window +
aggregate), no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAX_SUMMARY_WORDS = 250  # ref prompts/extract_nodes.py summary cap
MAX_SUMMARY_FACTS = 5


def node_summaries(
    nodes: DataFrame,
    edges: DataFrame,
    max_facts: int = MAX_SUMMARY_FACTS,
    max_words: int = MAX_SUMMARY_WORDS,
) -> DataFrame:
    """nodes + canonical edges -> nodes with a filled `summary` column.

    Summary = the node's earliest `max_facts` facts (as subject or object,
    ordered by valid_at then uuid), joined with spaces, truncated to
    `max_words` words. Deterministic and idempotent.
    """
    participating = edges.select(
        F.col("source_node_uuid").alias("uuid"), "fact", "valid_at", F.col("uuid").alias("eid")
    ).unionByName(
        edges.select(
            F.col("target_node_uuid").alias("uuid"), "fact", "valid_at",
            F.col("uuid").alias("eid"),
        )
    )
    w = Window.partitionBy("uuid").orderBy(F.asc_nulls_last("valid_at"), F.asc("eid"))
    top = (
        participating.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_facts)
        .groupBy("uuid")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", "fact"))), lambda s: s.fact
                ),
            ).alias("_summary")
        )
    )
    truncated = F.concat_ws(
        " ", F.slice(F.split(F.col("_summary"), r"\s+"), 1, max_words)
    )
    return (
        nodes.drop("summary")
        .join(top, on="uuid", how="left")
        .withColumn("summary", F.when(F.col("_summary").isNotNull(), truncated))
        .drop("_summary")
    )


def fill_node_attributes(nodes: DataFrame, edges: DataFrame, registry) -> DataFrame:
    """E5 attribute fill (deterministic twin of ref node_operations.py:402-506):
    for every (entity_label, field) -> predicate rule in the registry, a node
    carrying that label gets `attributes[field]` = the display name of the
    object of its earliest matching edge (ordered by valid_at, then edge
    uuid). One broadcast join against the tiny rule table; plurality of the
    work is a single window over the node's outgoing edges.
    """
    if not registry.node_attribute_rules:
        return nodes
    spark = nodes.sparkSession
    rules = F.broadcast(
        spark.createDataFrame(
            [(lbl, fld, pred) for (lbl, fld), pred in registry.node_attribute_rules.items()],
            schema="label string, field string, predicate string",
        )
    )
    labeled = nodes.select("uuid", F.explode("labels").alias("label")).join(
        rules, on="label"
    )
    target_names = nodes.select(
        F.col("uuid").alias("target_node_uuid"), F.col("name").alias("_value")
    )
    cand = (
        labeled.join(
            edges.select(
                F.col("source_node_uuid").alias("uuid"),
                F.col("name").alias("predicate"),
                "target_node_uuid",
                "valid_at",
                F.col("uuid").alias("_eid"),
            ),
            on=["uuid", "predicate"],
        )
        .join(target_names, on="target_node_uuid")
    )
    w = Window.partitionBy("uuid", "field").orderBy(
        F.asc_nulls_last("valid_at"), F.asc("_eid")
    )
    filled = (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy("uuid")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("field", "_value")))
            ).alias("_attrs")
        )
    )
    return (
        nodes.join(filled, on="uuid", how="left")
        .withColumn(
            "attributes",
            F.coalesce(F.col("_attrs"), F.col("attributes")),
        )
        .drop("_attrs")
    )


def fill_edge_attributes(edges: DataFrame, registry) -> DataFrame:
    """E6 attribute fill (deterministic twin of ref edge_operations.py:547-562):
    for every (edge_type, field) -> regex rule, edges named `edge_type` get
    `attributes[field]` = the first capture group matched against the fact.
    Pure whole-stage-codegen expressions — no joins, no Python."""
    if not registry.edge_attribute_rules:
        return edges
    by_type: dict[str, list[tuple[str, str]]] = {}
    for (etype, field), pattern in registry.edge_attribute_rules.items():
        by_type.setdefault(etype, []).append((field, pattern))

    expr = F.create_map().cast("map<string,string>")
    for etype, rules in sorted(by_type.items()):
        entries = F.filter(
            F.array(
                *[
                    F.struct(
                        F.lit(field).alias("key"),
                        F.regexp_extract(F.col("fact"), pattern, 1).alias("value"),
                    )
                    for field, pattern in sorted(rules)
                ]
            ),
            lambda s: s.value != "",
        )
        expr = F.when(F.col("name") == etype, F.map_from_entries(entries)).otherwise(expr)
    has_attrs = "attributes" in edges.columns
    out = edges.withColumn("attributes", expr) if not has_attrs else edges.withColumn(
        "attributes", F.when(F.size(F.map_keys(expr)) > 0, expr).otherwise(F.col("attributes"))
    )
    return out
