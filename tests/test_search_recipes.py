"""Q9/Q10 — hybrid search orchestrator over a small edge corpus."""

from graphiti_spark.extraction import embed_text
from graphiti_spark.search_recipes import (
    COMBINED_HYBRID_SEARCH_RRF,
    EDGE_HYBRID_SEARCH_RRF,
    NODE_HYBRID_SEARCH_MMR,
    SearchConfig,
    search,
)

FACTS = [
    ("e1", "alice works at acme corp", "a", "b"),
    ("e2", "bob works at globex", "c", "d"),
    ("e3", "acme corp acquired globex", "b", "d"),
    ("e4", "weather stayed mild all week", "x", "y"),
]


def _corpus(spark):
    rows = [(u, f, embed_text(f), s, t) for u, f, s, t in FACTS]
    return spark.createDataFrame(
        rows,
        schema="uuid string, fact string, fact_embedding array<float>, "
        "source_node_uuid string, target_node_uuid string",
    )


def test_hybrid_rrf(spark):
    c = _corpus(spark)
    out = search(c, "acme corp", query_vec=embed_text("acme corp"), config=EDGE_HYBRID_SEARCH_RRF)
    rows = out.collect()
    assert rows, "hybrid search returned nothing"
    top = rows[0]["uuid"]
    assert top in ("e1", "e3")  # both mention acme corp
    assert "e4" not in [r["uuid"] for r in rows[:2]]


def test_bm25_only_empty_query(spark):
    c = _corpus(spark)
    out = search(c, "", config=SearchConfig(methods=["bm25"], reranker="rrf"))
    assert out.count() == 0  # empty query, no vector -> empty (ref search.py:84)


def test_bfs_method(spark):
    c = _corpus(spark)
    cfg = SearchConfig(methods=["bfs"], reranker="rrf", bfs_origins=["a"])
    out = search(c, "", edges=c, config=cfg)
    got = {r["uuid"] for r in out.collect()}
    # BFS over node uuids from 'a': b (via e1) then d (via e3)
    assert got == {"b", "d"}


def test_mmr_recipe(spark):
    c = _corpus(spark)
    out = search(c, "acme corp works", query_vec=embed_text("acme corp"), config=NODE_HYBRID_SEARCH_MMR)
    assert out.count() >= 1


def test_filters_applied(spark):
    c = _corpus(spark)
    out = search(
        c,
        "acme corp",
        config=EDGE_HYBRID_SEARCH_RRF,
        filters=[[("uuid", "<>", "e1")]],
    )
    assert "e1" not in {r["uuid"] for r in out.collect()}


def test_cross_encoder_recipe(spark):
    from graphiti_spark.search_recipes import EDGE_HYBRID_SEARCH_CROSS_ENCODER

    c = _corpus(spark)
    out = search(
        c, "acme corp acquired globex",
        query_vec=embed_text("acme corp acquired globex"),
        config=EDGE_HYBRID_SEARCH_CROSS_ENCODER,
    ).collect()
    assert out and out[0]["uuid"] == "e3"  # exact token match wins the rerank


def test_all_fifteen_recipes_exist():
    import graphiti_spark.search_recipes as R

    names = [
        f"{scope}_HYBRID_SEARCH_{rr}"
        for scope, rrs in [
            ("EDGE", ["RRF", "MMR", "NODE_DISTANCE", "EPISODE_MENTIONS", "CROSS_ENCODER"]),
            ("NODE", ["RRF", "MMR", "NODE_DISTANCE", "EPISODE_MENTIONS", "CROSS_ENCODER"]),
            ("COMMUNITY", ["RRF", "MMR", "CROSS_ENCODER"]),
            ("COMBINED", ["RRF", "MMR", "CROSS_ENCODER"]),
        ]
        for rr in rrs
    ]
    assert len(names) == 16  # the 16 canned recipes of search_config_recipes.py:34-223
    for n in names:
        assert isinstance(getattr(R, n), R.SearchConfig), n


def test_search_all_cross_scope(spark):
    from graphiti_spark.search_recipes import COMBINED_HYBRID_SEARCH_RRF, search_all

    edges = _corpus(spark)
    nodes = spark.createDataFrame(
        [("a", "acme corp", embed_text("acme corp")),
         ("c", "bob", embed_text("bob")),
         ("x", "weather station", embed_text("weather station"))],
        schema="uuid string, name string, name_embedding array<float>",
    )
    out = search_all(
        {
            "edges": {"corpus": edges, "text_col": "fact", "vec_col": "fact_embedding"},
            "nodes": {"corpus": nodes, "text_col": "name", "vec_col": "name_embedding"},
        },
        "acme corp",
        query_vec=embed_text("acme corp"),
        config=COMBINED_HYBRID_SEARCH_RRF,
    ).collect()
    scopes = {r["scope"] for r in out}
    assert scopes == {"edges", "nodes"}
    node_hits = [r["uuid"] for r in out if r["scope"] == "nodes"]
    assert "a" in node_hits


def test_recipe_method_sets_match_reference():
    """ref search_config_recipes.py:84-94,146-148,191-193: the EDGE/NODE/
    COMBINED *_CROSS_ENCODER recipes include bfs; every other recipe (and
    the community scope, which has no bfs method) runs bm25+cosine only."""
    import graphiti_spark.search_recipes as R

    with_bfs = {
        "EDGE_HYBRID_SEARCH_CROSS_ENCODER",
        "NODE_HYBRID_SEARCH_CROSS_ENCODER",
        "COMBINED_HYBRID_SEARCH_CROSS_ENCODER",
    }
    for scope, rrs in [
        ("EDGE", ["RRF", "MMR", "NODE_DISTANCE", "EPISODE_MENTIONS", "CROSS_ENCODER"]),
        ("NODE", ["RRF", "MMR", "NODE_DISTANCE", "EPISODE_MENTIONS", "CROSS_ENCODER"]),
        ("COMMUNITY", ["RRF", "MMR", "CROSS_ENCODER"]),
        ("COMBINED", ["RRF", "MMR", "CROSS_ENCODER"]),
    ]:
        for rr in rrs:
            name = f"{scope}_HYBRID_SEARCH_{rr}"
            cfg = getattr(R, name)
            want = {"bm25", "cosine", "bfs"} if name in with_bfs else {"bm25", "cosine"}
            assert set(cfg.methods) == want, name
