"""G3/G4 label propagation vs an in-process port of the reference
algorithm (community_operations.py:86-131)."""

import random
from collections import defaultdict

from pyspark.sql import functions as F

from graphiti_spark.operators.communities import (
    build_community_tables,
    label_propagation,
    neighbor_projection,
)


def reference_lpa(
    projection: dict[str, list[tuple[str, int]]], max_rounds: int = 20
) -> list[list[str]]:
    """Faithful port of /root/reference .../community_operations.py:86-131
    (keys must be fed in uuid order to match the Spark dense-rank labels) —
    except bounded: the reference's synchronous update can oscillate forever
    (two nodes swapping labels each round), so both implementations stop
    after max_rounds and must then agree state-for-state."""
    community_map = {uuid: i for i, uuid in enumerate(projection.keys())}
    for _ in range(max_rounds):
        no_change = True
        new_community_map: dict[str, int] = {}
        for uuid, neighbors in projection.items():
            curr = community_map[uuid]
            cand: dict[int, int] = defaultdict(int)
            for nbr_uuid, cnt in neighbors:
                cand[community_map[nbr_uuid]] += cnt
            lst = sorted(((c, comm) for comm, c in cand.items()), reverse=True)
            rank, winner = lst[0] if lst else (0, -1)
            new = winner if (winner != -1 and rank > 1) else max(winner, curr)
            new_community_map[uuid] = new
            if new != curr:
                no_change = False
        if no_change:
            break
        community_map = new_community_map
    clusters = defaultdict(list)
    for uuid, comm in community_map.items():
        clusters[comm].append(uuid)
    return [sorted(v) for v in clusters.values()]


def _edges_df(spark, triples):
    return spark.createDataFrame(
        [("g", s, t) for s, t in triples],
        schema="group_id string, source_node_uuid string, target_node_uuid string",
    )


def _nodes_df(spark, ids):
    return spark.createDataFrame([("g", i) for i in ids], schema="group_id string, uuid string")


def _spark_clusters(spark, ids, triples):
    labels = label_propagation(_nodes_df(spark, ids), _edges_df(spark, triples))
    clusters = defaultdict(list)
    for r in labels.collect():
        clusters[r["community"]].append(r["uuid"])
    return sorted(sorted(v) for v in clusters.values())


def _oracle_clusters(ids, triples):
    proj: dict[str, list[tuple[str, int]]] = {u: [] for u in sorted(ids)}
    w: dict[tuple[str, str], int] = defaultdict(int)
    for s, t in triples:
        if s != t:
            w[(s, t)] += 1
            w[(t, s)] += 1
    for (u, v), cnt in w.items():
        proj[u].append((v, cnt))
    return sorted(reference_lpa(proj))


def test_lpa_two_cliques(spark):
    ids = [f"n{i}" for i in range(6)]
    triples = [
        ("n0", "n1"), ("n1", "n2"), ("n0", "n2"), ("n0", "n1"),  # weighted clique
        ("n3", "n4"), ("n4", "n5"), ("n3", "n5"), ("n3", "n4"),
    ]
    assert _spark_clusters(spark, ids, triples) == _oracle_clusters(ids, triples)


def test_lpa_singletons(spark):
    ids = ["a", "b", "c"]
    assert _spark_clusters(spark, ids, []) == _oracle_clusters(ids, [])


def test_lpa_random_graphs(spark):
    rng = random.Random(13)
    for trial in range(3):
        ids = [f"v{i:02d}" for i in range(12)]
        triples = [
            (rng.choice(ids), rng.choice(ids))
            for _ in range(20)
        ]
        triples = [(a, b) for a, b in triples if a != b]
        assert _spark_clusters(spark, ids, triples) == _oracle_clusters(ids, triples), (
            f"trial {trial}"
        )


def test_neighbor_projection_weights(spark):
    e = _edges_df(spark, [("a", "b"), ("a", "b"), ("b", "a")])
    rows = {(r["u"], r["v"]): r["w"] for r in neighbor_projection(e).collect()}
    assert rows == {("a", "b"): 3, ("b", "a"): 3}


def test_build_community_tables(spark):
    # two triangles (2-cliques oscillate forever under the reference's
    # synchronous rule; triangles converge to one community each)
    ids = [f"n{i}" for i in range(6)]
    nodes = spark.createDataFrame(
        [("g", i, f"Name {i}", None) for i in ids],
        schema="group_id string, uuid string, name string, created_at timestamp",
    )
    edges = _edges_df(
        spark,
        [("n0", "n1"), ("n1", "n2"), ("n0", "n2"), ("n3", "n4"), ("n4", "n5"), ("n3", "n5")],
    )
    comms, members = build_community_tables(nodes, edges)
    c = comms.collect()
    m = members.collect()
    assert len(c) == 2
    assert len(m) == 6
    # every member points at an existing community uuid
    cuuids = {r["uuid"] for r in c}
    assert {r["source_node_uuid"] for r in m} == cuuids
    # deterministic: re-running yields identical uuids
    comms2, _ = build_community_tables(nodes, edges)
    assert {r["uuid"] for r in comms2.collect()} == cuuids


def test_attach_new_members_plurality(spark):
    from graphiti_spark.operators.communities import attach_new_members

    members = spark.createDataFrame(
        [("m1", "g", "c1", "n0"), ("m2", "g", "c1", "n1"), ("m3", "g", "c2", "n2")],
        schema="edge_uuid string, group_id string, source_node_uuid string, "
        "target_node_uuid string",
    )
    # new node n9 touches two c1 members and one c2 member -> joins c1;
    # node n8 has no neighbors -> stays unassigned; n0 already a member
    edges = _edges_df(spark, [("n9", "n0"), ("n1", "n9"), ("n9", "n2"), ("n0", "n1")])
    new_nodes = spark.createDataFrame(
        [("n9", "g"), ("n8", "g"), ("n0", "g")], schema="uuid string, group_id string"
    )
    out = attach_new_members(members, edges, new_nodes).collect()
    assert len(out) == 1
    assert out[0]["target_node_uuid"] == "n9"
    assert out[0]["source_node_uuid"] == "c1"
    # idempotent: applying the union again attaches nothing new
    members2 = members.unionByName(
        spark.createDataFrame(out, schema=members.schema)
    )
    assert attach_new_members(members2, edges, new_nodes).count() == 0
