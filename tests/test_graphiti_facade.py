"""GraphitiSpark facade: the reference's public Graphiti method surface
(add_episode[_bulk] / retrieve_episodes / search / search_ / add_triplet /
remove_episode / build_communities / get_nodes_and_edges_by_episode) over a
persistent store — one stateful object, state accumulating across calls."""

from datetime import datetime, timezone

from graphiti_spark.datagen import generate_web_pages
from graphiti_spark.graphiti import GraphitiSpark
from graphiti_spark.search_recipes import COMBINED_HYBRID_SEARCH_RRF

NOW = datetime(2026, 8, 18, tzinfo=timezone.utc)


def _client(spark, tmp_path) -> GraphitiSpark:
    return GraphitiSpark(spark, str(tmp_path / "graph"))


def test_facade_end_to_end(spark, tmp_path):
    g = _client(spark, tmp_path)
    g.build_indices_and_constraints()

    rows = generate_web_pages(n_pages=40, seed=42)
    g.add_episode_bulk(
        [
            {"url": r["url"], "warc_ts": r["warc_ts"], "text": r["text"],
             "lang": r["lang"], "group_id": r["url"].split("/")[3]}
            for r in rows
        ]
    )
    n_nodes = g.store.read("nodes").count()
    n_edges = g.store.read("edges").count()
    n_eps = g.store.read("episodes").count()
    assert n_nodes > 0 and n_edges > 0 and n_eps > 0

    # single-episode ingest accumulates into the same store
    g.add_episode(
        name="https://manual.example/x",
        episode_body="Alice Smith works at Initech Corp. Bob Jones met Alice Smith.",
        reference_time=NOW,
        group_id="manual",
        source="message",
        source_description="unit test",
    )
    assert g.store.read("episodes").count() == n_eps + 1
    assert g.store.read("nodes").count() > n_nodes

    # retrieval window: last-n per group, chronological
    eps = g.retrieve_episodes(NOW, last_n=2, group_ids=["manual"]).collect()
    assert len(eps) == 1 and eps[0]["group_id"] == "manual"
    # per-episode source metadata survives the S3 contract's defaults
    assert eps[0]["source"] == "message" and eps[0]["source_description"] == "unit test"

    # hybrid edge search finds the manual fact
    hits = g.search("Alice Smith Initech", num_results=5).collect()
    assert len(hits) > 0

    # cross-scope search returns every scope
    all_hits = g.search_("Alice Smith", config=COMBINED_HYBRID_SEARCH_RRF)
    scopes = {r["scope"] for r in all_hits.collect()}
    assert "edges" in scopes and "nodes" in scopes

    # provenance lookup for the manual episode
    ep_uuid = (
        g.store.read("episodes").filter("group_id = 'manual'").collect()[0]["uuid"]
    )
    got = g.get_nodes_and_edges_by_episode([ep_uuid])
    assert got["nodes"].count() > 0 and got["edges"].count() > 0

    # hand-asserted triple joins the graph through the full chain
    g.add_triplet("manual", "Alice Smith", "reports to", "Carol Chan", valid_at=NOW)
    assert (
        g.store.read("edges").filter("group_id = 'manual'").count() > 0
    )

    # communities build over the accumulated graph
    communities = g.build_communities()
    assert communities.count() > 0
    assert g.store.exists("community_members")

    # cascade delete: the manual episode's exclusive entities disappear
    before = g.store.read("nodes").count()
    g.remove_episode(ep_uuid)
    assert g.store.read("episodes").filter("uuid = '%s'" % ep_uuid).count() == 0
    assert g.store.read("nodes").count() < before
    g.close()
