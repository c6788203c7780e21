"""Q9/Q10/Q13 — the search orchestrator and canned recipes.

The reference fans out fulltext + cosine + BFS per scope and fuses with a
configured reranker (/root/reference/graphiti_core/search/search.py:68-182;
recipes in search/search_config_recipes.py:34-223). Here a SearchConfig is
a plain dataclass and `search()` is a library function over the
materialized tables; each method is a DataFrame and fusion is one more
DataFrame op, so a batch of queries would be a join instead of a loop.

Default limits/oversampling follow the reference: limit 10
(search_config.py:29), each method oversamples 2x the limit
(search.py:205) before fusion.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphiti_spark import search as S

DEFAULT_SEARCH_LIMIT = 10  # ref search_config.py:29


@dataclass
class SearchConfig:
    """Which candidate generators run and how results fuse."""

    methods: list[str] = field(default_factory=lambda: ["bm25", "cosine"])
    reranker: str = "rrf"          # rrf | node_distance | episode_mentions | mmr
    limit: int = DEFAULT_SEARCH_LIMIT
    min_score: float = 0.0
    mmr_lambda: float = S.DEFAULT_MMR_LAMBDA
    bfs_origins: list[str] | None = None
    center_uuid: str | None = None


# The canned recipes of search_config_recipes.py:34-223, one per
# (scope, reranker) combination the reference ships. Most run
# [bm25, cosine_similarity] candidates; the EDGE/NODE/COMBINED
# *_CROSS_ENCODER recipes additionally include bfs (ref :84-94, 146-148,
# 191-193 — community scope has no bfs method). "cross_encoder" maps to
# the deterministic token-overlap reranker (search.token_overlap_rerank —
# the LLM-free stand-in for the reference's cross-encoder client).
# COMBINED_* recipes are cross-scope: feed them to `search_all`.
EDGE_HYBRID_SEARCH_RRF = SearchConfig(methods=["bm25", "cosine"], reranker="rrf")
EDGE_HYBRID_SEARCH_MMR = SearchConfig(methods=["bm25", "cosine"], reranker="mmr")
EDGE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    methods=["bm25", "cosine"], reranker="node_distance"
)
EDGE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    methods=["bm25", "cosine"], reranker="episode_mentions"
)
EDGE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    methods=["bm25", "cosine", "bfs"], reranker="cross_encoder"
)
NODE_HYBRID_SEARCH_RRF = SearchConfig(methods=["bm25", "cosine"], reranker="rrf")
NODE_HYBRID_SEARCH_MMR = SearchConfig(methods=["bm25", "cosine"], reranker="mmr")
NODE_HYBRID_SEARCH_NODE_DISTANCE = SearchConfig(
    methods=["bm25", "cosine"], reranker="node_distance"
)
NODE_HYBRID_SEARCH_EPISODE_MENTIONS = SearchConfig(
    methods=["bm25", "cosine"], reranker="episode_mentions"
)
NODE_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    methods=["bm25", "cosine", "bfs"], reranker="cross_encoder"
)
COMMUNITY_HYBRID_SEARCH_RRF = SearchConfig(methods=["bm25", "cosine"], reranker="rrf")
COMMUNITY_HYBRID_SEARCH_MMR = SearchConfig(methods=["bm25", "cosine"], reranker="mmr")
COMMUNITY_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    methods=["bm25", "cosine"], reranker="cross_encoder"
)
COMBINED_HYBRID_SEARCH_RRF = SearchConfig(methods=["bm25", "cosine"], reranker="rrf")
COMBINED_HYBRID_SEARCH_MMR = SearchConfig(methods=["bm25", "cosine"], reranker="mmr")
COMBINED_HYBRID_SEARCH_CROSS_ENCODER = SearchConfig(
    methods=["bm25", "cosine", "bfs"], reranker="cross_encoder"
)


def _ranked(df: DataFrame, score_col: str) -> DataFrame:
    w = Window.orderBy(F.desc(score_col), F.asc("uuid"))
    return df.select("uuid", F.row_number().over(w).cast("long").alias("rank"))


def search(
    corpus: DataFrame,
    query: str,
    query_vec: list[float] | None = None,
    config: SearchConfig | None = None,
    edges: DataFrame | None = None,
    mentions: DataFrame | None = None,
    id_col: str = "uuid",
    text_col: str = "fact",
    vec_col: str = "fact_embedding",
    filters: list[list[tuple]] | None = None,
) -> DataFrame:
    """Hybrid search over one scope (edges/nodes/episodes/communities table).

    Returns (uuid, score) ordered desc, sliced to config.limit. Empty query
    with no vector -> empty result (ref search.py:84-85).
    """
    config = config or EDGE_HYBRID_SEARCH_RRF
    spark = corpus.sparkSession
    if filters:
        corpus = corpus.filter(S.compile_filters(filters))
    corpus = corpus.persist()

    oversample = config.limit * 2  # ref search.py:205
    result_lists: list[DataFrame] = []

    if "bm25" in config.methods and query.strip():
        bm = S.bm25_search(corpus, id_col, text_col, query, limit=oversample)
        result_lists.append(
            _ranked(bm.withColumnRenamed("doc", "uuid"), "score")
        )
    if "cosine" in config.methods and query_vec is not None:
        q = spark.createDataFrame([("q", query_vec)], schema="q_id string, q_vec array<float>")
        c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec")).filter(
            F.col("c_vec").isNotNull()
        )
        cos = S.cosine_topk(q, c, k=oversample, min_score=S.DEFAULT_MIN_SCORE)
        result_lists.append(_ranked(cos.withColumnRenamed("c_id", "uuid"), "cos"))
    if "bfs" in config.methods and config.bfs_origins and edges is not None:
        origins = spark.createDataFrame([(o,) for o in config.bfs_origins], ["id"])
        bi = edges.select(
            F.col("source_node_uuid").alias("src"), F.col("target_node_uuid").alias("dst")
        )
        reached = S.bfs(bi, origins).filter(F.col("depth") > 0)
        result_lists.append(
            reached.select(
                F.col("id").alias("uuid"),
                F.row_number()
                .over(Window.orderBy(F.asc("depth"), F.asc("id")))
                .cast("long")
                .alias("rank"),
            ).limit(oversample)
        )

    if not result_lists:
        return spark.createDataFrame([], schema="uuid string, score double")

    fused = S.rrf(result_lists, min_score=config.min_score)

    if config.reranker == "cross_encoder" and query.strip():
        fused = S.token_overlap_rerank(
            fused.select("uuid"), corpus, id_col, text_col, query
        )
    elif config.reranker == "node_distance" and config.center_uuid and edges is not None:
        bi = edges.select(
            F.col("source_node_uuid").alias("src"), F.col("target_node_uuid").alias("dst")
        )
        fused = S.node_distance_rerank(fused.select("uuid"), bi, config.center_uuid)
    elif config.reranker == "episode_mentions" and mentions is not None:
        fused = S.episode_mentions_rerank(fused.select("uuid"), mentions)
    elif config.reranker == "mmr" and query_vec is not None:
        cands = fused.join(
            corpus.select(F.col(id_col).alias("uuid"), F.col(vec_col).alias("emb")), on="uuid"
        ).select(F.lit("q").alias("q_id"), F.col("uuid").alias("c_id"), F.col("score").alias("rel"), "emb")
        ranked = S.mmr_rerank(cands, mmr_lambda=config.mmr_lambda, k=config.limit)
        fused = ranked.select(
            F.col("c_id").alias("uuid"), (1.0 / F.col("mmr_rank")).alias("score")
        )

    out = fused.orderBy(F.desc("score"), F.asc("uuid")).limit(config.limit)
    corpus.unpersist()
    return out


def search_all(
    scopes: dict[str, dict],
    query: str,
    query_vec: list[float] | None = None,
    config: SearchConfig | None = None,
    edges: DataFrame | None = None,
    mentions: DataFrame | None = None,
) -> DataFrame:
    """Cross-scope combined search (ref search/search.py:112-165 fans out
    edge / node / episode / community searches concurrently and returns one
    SearchResults). `scopes` maps a scope name to its table spec:
    {"corpus": DataFrame, "text_col": str, "vec_col": str, "id_col": str}.

    Returns (scope, uuid, score) — each scope ranked by the shared config
    (use the COMBINED_* recipes); Spark runs the per-scope plans as
    independent jobs exactly as the reference gathers its four coroutines.
    """
    out: DataFrame | None = None
    for name, spec in scopes.items():
        r = search(
            spec["corpus"],
            query,
            query_vec,
            config,
            edges=edges,
            mentions=mentions,
            id_col=spec.get("id_col", "uuid"),
            text_col=spec.get("text_col", "fact"),
            vec_col=spec.get("vec_col", "fact_embedding"),
        ).select(F.lit(name).alias("scope"), "uuid", "score")
        out = r if out is None else out.unionByName(r)
    assert out is not None, "search_all requires at least one scope"
    return out
