"""Structured Streaming ingest wrapper — continuous crawl feeds.

The reference has no streaming surface (incrementality is one episode at a
time with last-3 context; SURVEY.md §2.8); its deployment scales by queue
workers. The Spark-native equivalent: a `readStream` over the landing
table/directory of web pages, `foreachBatch` running the SAME batch
pipeline incrementally — each micro-batch resolves against the current
canonical node snapshot (D11, node_dedup.resolve_names(existing_nodes))
and MERGE-upserts into the store, so stream and batch share one code path
(the Kappa-style arrangement Spark encourages).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from graphiti_spark.pipeline import run_pipeline
from graphiti_spark.store import ParquetStore


def ingest_stream(
    spark: SparkSession,
    input_path: str,
    store_root: str,
    checkpoint_location: str,
    schema=None,
    available_now: bool = True,
    with_embeddings: bool = False,
):
    """Start a streaming query that ingests page files appearing under
    `input_path` into the graph store. Returns the StreamingQuery.

    available_now=True drains everything currently present then stops —
    the testable mode; False runs continuously.
    """
    from graphiti_spark.schemas import WEB_PAGES

    store = ParquetStore(spark, store_root)
    reader = spark.readStream.schema(schema or WEB_PAGES).parquet(input_path)

    def _process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        existing = store.read("nodes") if store.exists("nodes") else None
        result = run_pipeline(
            spark,
            batch_df,
            with_embeddings=with_embeddings,
            existing_nodes=existing,
        )
        store.merge_upsert("nodes", result["nodes"], array_merge_cols=("aliases",))
        store.merge_upsert("edges", result["edges"], array_merge_cols=("episodes",))
        store.merge_upsert("mentions", result["mentions"])
        # G6 incremental communities: if a community structure exists, new
        # entities join the plurality community of their neighbors instead
        # of re-running label propagation over the whole graph
        # (ref community_operations.py:252-340)
        if store.exists("community_members"):
            from graphiti_spark.operators.communities import attach_new_members

            new_members = attach_new_members(
                store.read("community_members"), store.read("edges"), result["nodes"]
            )
            store.merge_upsert("community_members", new_members, key="edge_uuid")
        # every upsert has materialized its input — drop this micro-batch's
        # stage caches so storage memory stays flat across the stream's life
        result["release"]()

    writer = reader.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_location
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
