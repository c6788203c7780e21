"""The end-to-end KG-construction pipeline (S2/add_episode_bulk re-expressed).

One Spark job reproduces the reference's 12-step bulk chain
(/root/reference/graphiti_core/graphiti.py:584-870, traced in SURVEY.md
§3.2) as declarative DataFrame stages:

    web_pages ─ S3 ─> episodes ─ E1 ─> raw mentions ──> D1-D14 canonicalize
                         │                                  │
                         └─ E3 ─> raw triples ─ D15 ──> T1/T2 dedup
                                                          │
                        T6/T7 invalidation ─> T5/T10 near-dup merge ─> edges
    nodes + mentions + edges ─ S6 ─> materialized tables (+ manifests)

Stage boundaries checkpoint to parquet with lineage manifests so any stage
resumes idempotently (lineage.StageRunner).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphiti_spark.functions.udfs import (
    embed_udf,
    extract_all_df,
    html_to_text_udf,
    normalize_exact_col,
    split_extraction,
)
from graphiti_spark.lineage import StageRunner
from graphiti_spark.operators.edge_ops import (
    INV_MAP_BROADCAST_MAX,
    apply_edge_merge,
    apply_invalidation,
    dedup_edges,
    invalidate_contradictions,
    invalidation_map,
    merge_near_duplicate_edges,
    near_dup_canonical_map,
    rewrite_pointers,
)
from graphiti_spark.operators.node_dedup import (
    build_canonical_nodes,
    det_id_col,
    resolve_names,
)


def pages_to_episodes(pages: DataFrame, group_col=None, lang: str | None = "en") -> DataFrame:
    """S3: RawEpisode contract from web pages. Text comes from the html->text
    UDF (byte-identical per url); the input text column, when present, is
    only a cross-check. group_id defaults to the url host."""
    if group_col is None:
        group_col = F.regexp_extract(F.col("url"), r"https?://([^/]+)", 1)
    df = pages
    if lang is not None and "lang" in pages.columns:
        df = df.filter(F.col("lang") == lang)
    content = (
        F.when(F.col("html").isNotNull(), html_to_text_udf(F.col("html")))
        .otherwise(F.col("text"))
        if "html" in df.columns
        else F.col("text")
    )
    return df.select(
        det_id_col(F.lit("ep"), F.col("url"), F.col("warc_ts").cast("string")).alias(
            "episode_uuid"
        ),
        F.col("url").alias("name"),
        group_col.alias("group_id"),
        F.lit("text").alias("source"),
        F.lit("web crawl").alias("source_description"),
        content.alias("content"),
        F.col("warc_ts").alias("ep_valid_at"),
    )


def build_mentions_table(raw_mentions: DataFrame, name_resolution: DataFrame) -> DataFrame:
    """G1: MENTIONS provenance edges episode -> canonical entity."""
    m = raw_mentions.withColumn("norm_exact", normalize_exact_col(F.col("name")))
    return (
        m.join(name_resolution, on=["group_id", "norm_exact"])
        .groupBy(
            "group_id",
            F.col("episode_uuid").alias("source_node_uuid"),
            F.col("canonical_id").alias("target_node_uuid"),
        )
        .agg(F.min("ep_valid_at").alias("created_at"))
        .withColumn(
            "uuid",
            det_id_col(
                F.lit("mention"),
                F.col("source_node_uuid"),
                F.col("target_node_uuid"),
            ),
        )
        .select("uuid", "group_id", "source_node_uuid", "target_node_uuid", "created_at")
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    group_col=None,
    lang: str | None = "en",
    now: datetime | None = None,
    checkpoint_dir: str | None = None,
    with_embeddings: bool = True,
    existing_nodes: DataFrame | None = None,
    registry=None,
    reflexion: bool = False,
) -> dict:
    """Full batch ingest. Returns dict with episodes/nodes/edges/mentions
    DataFrames plus per-stage metrics.

    With a `registry` (ontology.TypeRegistry) the edge_type_map is enforced
    on the canonical edges and E5/E6 attribute rules fill the node/edge
    `attributes` maps (ref graphiti.py:393-397 + the per-type attribute
    extraction the SURVEY traces as E5/E6)."""
    now = now or datetime.now(timezone.utc)
    runner = StageRunner(spark, checkpoint_dir)

    # input fingerprint: cheap & stable — count + paths
    try:
        in_files = ",".join(sorted(pages.inputFiles()))
    except Exception:
        in_files = "inline"
    # the reflexion flag changes extraction output, so it is part of the
    # stage fingerprint (a durable checkpoint from the other mode must miss)
    in_fp = f"{in_files}:rfx{int(reflexion)}"

    # episodes stay lazy: the fused extraction scans them exactly once, so
    # there is nothing to share; callers materialize on demand
    episodes = pages_to_episodes(pages, group_col, lang)

    # one pass over the corpus produces mentions AND triples (kind-tagged),
    # halving the Python/Arrow transfer of page content
    # E2 reflexion (opt-in, ref node_operations.py:62-82 — default-off via
    # MAX_REFLEXION_ITERATIONS=0): adds the deterministic second-pass
    # mention family inside the same fused scan, zero extra jobs
    raw_all = runner.run(
        "extraction", in_fp, lambda: extract_all_df(episodes, reflexion=reflexion)
    )
    raw_mentions, raw_triples = split_extraction(raw_all)

    # D1-D14 global canonicalization
    name_resolution = runner.run(
        "name_resolution",
        in_fp,
        lambda: resolve_names(
            raw_mentions, existing_nodes, cache_registry=runner.persisted
        ),
    )

    resolved_triples = rewrite_pointers(raw_triples, name_resolution)
    # dedup / invalidation / merge are separate stages: invalidation and
    # merge both self-join their input, so each table must be
    # materialized first or the whole upstream DAG runs twice.
    # With embeddings requested they are computed once in the dedup stage
    # and reused by the merge judgment and the final table; without them
    # (P/R tests) the merge embeds only edges sharing an endpoint pair —
    # singleton pairs can never merge, and at web scale that is almost
    # all of them.
    n_parts = spark.sparkContext.defaultParallelism * 2

    def _build_deduped():
        d = dedup_edges(resolved_triples)
        if with_embeddings:
            # embed ONCE here (the reference also embeds up front,
            # bulk_utils.py:427-431): the near-dup merge reuses the column
            # (skipping its internal embed pass + repartition shuffle) and
            # the canonical edge keeps its own fact, so the final table's
            # embeddings are these exact vectors — no re-embed at write.
            # The explicit repartition spreads the pandas UDF over every
            # core; AQE would coalesce the small upstream exchange.
            d = d.repartition(n_parts).withColumn(
                "fact_embedding", embed_udf(F.col("fact"))
            )
        return d

    # nodes / edge-dedup / mentions only consume already-materialized
    # stages and are mutually independent. For SMALL inputs they run as
    # concurrent actions from a thread pool: each job alone can't fill the
    # machine, so overlapping hides per-job scheduling barriers. For LARGE
    # inputs every stage saturates all cores by itself — interleaving three
    # shuffle-heavy jobs only thrashes cache and shuffle I/O (measured:
    # 1.57x wave speedup at 4x cores vs ~3x for the sequential stages), so
    # they run back to back.
    build_nodes = lambda: build_canonical_nodes(name_resolution, raw_mentions)  # noqa: E731
    build_ments = lambda: build_mentions_table(raw_mentions, name_resolution)  # noqa: E731
    if runner.rows.get("extraction", 0) < 1_000_000:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_nodes = pool.submit(runner.run, "nodes_canonical", in_fp, build_nodes)
            f_deduped = pool.submit(runner.run, "edges_dedup", in_fp, _build_deduped)
            f_mentions = pool.submit(runner.run, "mentions", in_fp, build_ments)
            nodes = f_nodes.result()
            deduped = f_deduped.result()
            mentions = f_mentions.result()
    else:
        deduped = runner.run("edges_dedup", in_fp, _build_deduped)
        if runner.dir is None and registry is None:
            # large in-memory path: nodes and mentions are consumed exactly
            # once (by the caller's table write) and nothing downstream
            # reads them, so their eager persist+count here would be two
            # pure-overhead barriers. Left lazy, their computation runs
            # INSIDE the caller's concurrent nodes/edges/mentions write —
            # overlapping with the edge-assembly write on cores the single
            # write jobs can't fill. (With a `registry` nodes feeds two
            # consumers — edge-type enforcement and attribute fill — so it
            # must stay materialized; durable mode checkpoints every stage.)
            nodes = build_nodes()
            mentions = build_ments()
            runner.metrics.append(
                {"stage": "nodes_canonical", "sec": 0.0, "rows": None, "lazy": True}
            )
            runner.metrics.append(
                {"stage": "mentions", "sec": 0.0, "rows": None, "lazy": True}
            )
        else:
            nodes = runner.run("nodes_canonical", in_fp, build_nodes)
            mentions = runner.run("mentions", in_fp, build_ments)

    # Invalidation BEFORE near-dup merge, matching the oracle (oracle.py:169
    # invalidates at arrival over the full pre-merge edge set, then merges):
    # a merged-away near-dup may still be the earliest contradiction trigger
    # for an edge with a different target, and the canonical edge must carry
    # temporal columns computed against that full set.
    #
    # The near-dup canonical map depends only on columns invalidation never
    # touches (uuid, endpoints, fact embeddings), so it is computed from the
    # deduped table CONCURRENTLY with invalidation — the two heaviest jobs
    # overlap — and applied to the invalidated table afterwards. Result is
    # identical to merge_near_duplicate_edges(invalidated).
    build_inv = lambda: invalidate_contradictions(  # noqa: E731
        deduped, now, known_edge_count=runner.rows.get("edges_dedup")
    )

    # the canonical map is a real runner stage (resumable in durable mode);
    # apply_edge_merge's broadcast-vs-shuffle gate uses its materialized row
    # count — the map size is exactly what the gate is about
    def _build_canon():
        canon, _ = near_dup_canonical_map(
            deduped, known_edge_count=runner.rows.get("edges_dedup")
        )
        return canon

    if runner.dir is not None:
        # durable mode keeps every stage as a resumable parquet checkpoint
        invalidated = runner.run("edges_invalidate", in_fp, build_inv)
        canon = runner.run("edges_canon_map", in_fp, _build_canon)
        edges = runner.run(
            "edges",
            in_fp,
            lambda: apply_edge_merge(invalidated, canon, runner.rows["edges_canon_map"]),
        )
    else:
        # in-memory path (any size): only the SMALL invalidation map
        # materializes; the full-width edge table is never cached again
        # after edges_dedup — invalidation folds in via a broadcast join
        # and the near-dup merge chains on top lazily. Re-caching the
        # 128-float embedding column is memory-bandwidth-bound — the one
        # resource a bigger cluster does scale that a wider single box
        # does not — so skipping two full-width cache passes here is what
        # keeps N-vs-4N efficiency at the north-rule bar (and at small
        # batch sizes it removes one whole persist+count barrier). The
        # invalidation map and the near-dup canonical map both derive from
        # the cached dedup output and touch disjoint columns, so they run
        # CONCURRENTLY — each alone is a chain of shuffle jobs with
        # scheduling barriers that leave cores idle.
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        def _timed_inv():
            t0 = _time.time()
            m = invalidation_map(
                deduped,
                known_edge_count=runner.rows.get("edges_dedup"),
                cache_registry=runner.persisted,
            ).persist()
            runner.persisted.append(m)
            n = m.count()
            runner.metrics.append(
                {"stage": "edges_invalidate", "sec": round(_time.time() - t0, 3), "rows": n}
            )
            return m, n

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_inv = pool.submit(_timed_inv)
            f_canon = pool.submit(runner.run, "edges_canon_map", in_fp, _build_canon)
            inv_map, n_inv = f_inv.result()
            canon = f_canon.result()
        invalidated = apply_invalidation(
            deduped, inv_map, now, broadcast_map=n_inv <= INV_MAP_BROADCAST_MAX
        )
        merged = apply_edge_merge(invalidated, canon, runner.rows["edges_canon_map"])
        if runner.rows.get("edges_dedup", 0) < 1_000_000:
            # small batches: the driver entries / P/R gate read the edge
            # table several times, so one cheap materialization pays off
            edges = runner.run("edges", in_fp, lambda: merged)
        else:
            # large batches: the caller's table write is the first (and
            # only) full materialization of the output
            edges = merged
            runner.metrics.append(
                {"stage": "edges", "sec": 0.0, "rows": None, "lazy": True}
            )

    if with_embeddings:
        # edges already carry fact_embedding from the edges_dedup stage
        nodes = nodes.withColumn("name_embedding", embed_udf(F.col("name")))

    if registry is not None:
        from graphiti_spark.ontology import enforce_edge_type_map
        from graphiti_spark.operators.attributes import (
            fill_edge_attributes,
            fill_node_attributes,
        )

        edges = fill_edge_attributes(
            enforce_edge_type_map(edges, nodes, registry), registry
        )
        nodes = fill_node_attributes(nodes, edges, registry)

    # episode.entity_edges: uuids of edges whose provenance includes the
    # episode (ref graphiti.py:544-546) — lazy; computed if consumed
    ep_edges = (
        edges.select(F.col("uuid").alias("edge_uuid"), F.explode("episodes").alias("episode_uuid"))
        .groupBy("episode_uuid")
        .agg(F.sort_array(F.collect_list("edge_uuid")).alias("entity_edges"))
    )
    episodes_out = episodes.join(ep_edges, on="episode_uuid", how="left").withColumn(
        "entity_edges", F.coalesce(F.col("entity_edges"), F.array().cast("array<string>"))
    )

    from graphiti_spark.operators.node_dedup import duplicate_pair_edges

    return {
        "episodes_with_edges": episodes_out,
        "episodes": episodes,
        "raw_mentions": raw_mentions,
        "raw_triples": raw_triples,
        "name_resolution": name_resolution,
        # lazy derivation of the materialized resolution table — consumed
        # by callers that persist the IS_DUPLICATE_OF provenance
        "duplicate_pairs": duplicate_pair_edges(name_resolution, now=now),
        "nodes": nodes,
        "edges": edges,
        "mentions": mentions,
        "metrics": runner.metrics,
        "now": now,
        # unpersist every stage/operator cache created by this run — call
        # after the outputs are materialized (written/collected). Without
        # it a long-lived session accumulates per-batch cache blocks
        # (streaming foreachBatch, notebooks).
        # localCheckpointed frames release through the same unpersist call
        # (their blocks are ordinary cache blocks pinned by the RDD)
        "release": lambda: [df.unpersist() for df in runner.persisted],
    }


def add_triplets(
    spark: SparkSession,
    triplets: DataFrame,
    now: datetime | None = None,
    existing_nodes: DataFrame | None = None,
) -> dict:
    """Manual triple ingestion (ref graphiti.py:1018-1083 `add_triplet`),
    generalized to a batch: triplets(group_id, subject, predicate, object
    [, fact, valid_at]) run the same resolve -> canonicalize -> dedup ->
    merge -> invalidate chain as extracted triples, so a hand-asserted fact
    is indistinguishable from an extracted one. With `existing_nodes` the
    names resolve against the current graph (D11) exactly like a streaming
    micro-batch. Returns {nodes, edges, mentions} frames for merge_upsert.
    """
    now = now or datetime.now(timezone.utc)
    t = triplets
    if "fact" not in t.columns:
        t = t.withColumn("fact", F.concat_ws(" ", "subject", "predicate", "object"))
    if "valid_at" not in t.columns:
        t = t.withColumn("valid_at", F.lit(now).cast("timestamp"))
    if "invalid_at" not in t.columns:
        t = t.withColumn("invalid_at", F.lit(None).cast("timestamp"))
    t = (
        t.withColumn("ep_valid_at", F.coalesce(F.col("valid_at"), F.lit(now).cast("timestamp")))
        .withColumn(
            "episode_uuid",
            det_id_col(
                F.lit("manual"), F.col("group_id"), F.col("subject"),
                F.col("predicate"), F.col("object"),
            ),
        )
        .withColumn("triple_idx", F.lit(0).cast("long"))
    )
    m = (
        t.select(
            "episode_uuid", "group_id", "ep_valid_at",
            F.col("subject").alias("name"),
            F.lit("Entity").alias("entity_type"),
            F.lit(0).cast("long").alias("mention_idx"),
        )
        .unionByName(
            t.select(
                "episode_uuid", "group_id", "ep_valid_at",
                F.col("object").alias("name"),
                F.lit("Entity").alias("entity_type"),
                F.lit(1).cast("long").alias("mention_idx"),
            )
        )
        .persist()
    )
    caches: list[DataFrame] = [m]
    name_resolution = resolve_names(m, existing_nodes, cache_registry=caches).persist()
    caches.append(name_resolution)
    nodes = build_canonical_nodes(name_resolution, m)
    deduped = (
        dedup_edges(rewrite_pointers(t, name_resolution))
        .withColumn("fact_embedding", embed_udf(F.col("fact")))
        .persist()
    )
    caches.append(deduped)
    edges = merge_near_duplicate_edges(invalidate_contradictions(deduped, now))
    mentions = build_mentions_table(m, name_resolution)
    return {
        "nodes": nodes,
        "edges": edges,
        "mentions": mentions,
        "now": now,
        "release": lambda: [df.unpersist() for df in caches],
    }


def spark_triple_set(result: dict) -> set[tuple]:
    """Comparable triple identity matching oracle.triple_set: canonical name
    = min normalized alias of the component."""
    nodes = result["nodes"].select("uuid", "norm_name")
    e = (
        result["edges"]
        .join(
            nodes.withColumnRenamed("uuid", "source_node_uuid").withColumnRenamed(
                "norm_name", "subj_name"
            ),
            on="source_node_uuid",
        )
        .join(
            nodes.withColumnRenamed("uuid", "target_node_uuid").withColumnRenamed(
                "norm_name", "obj_name"
            ),
            on="target_node_uuid",
        )
        .select("group_id", "subj_name", "name", "obj_name", "norm_fact")
    )
    return {
        (r["group_id"], r["subj_name"], r["name"], r["obj_name"], r["norm_fact"])
        for r in e.collect()
    }
