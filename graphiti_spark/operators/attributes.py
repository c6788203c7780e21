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
