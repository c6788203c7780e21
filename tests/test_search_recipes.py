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
