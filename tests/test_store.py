"""S4-S6, S10-S11 — store semantics: merge upsert, episode windows,
cascade delete."""

from datetime import datetime, timezone

from pyspark.sql import functions as F

from graphiti_spark.store import (
    ParquetStore,
    previous_episodes_bulk,
    remove_episode,
    retrieve_episodes,
)


def ts(h):
    return datetime(2024, 1, 1, h, tzinfo=timezone.utc)


def test_merge_upsert(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("u1", "g", "a"), ("u2", "g", "b")], schema="uuid string, group_id string, v string"
    )
    store.merge_upsert("nodes", base)
    upd = spark.createDataFrame(
        [("u2", "g", "B2"), ("u3", "g", "c")], schema="uuid string, group_id string, v string"
    )
    store.merge_upsert("nodes", upd)
    got = {r["uuid"]: r["v"] for r in store.read("nodes").collect()}
    assert got == {"u1": "a", "u2": "B2", "u3": "c"}
    # idempotent re-apply
    store.merge_upsert("nodes", upd)
    assert {r["uuid"]: r["v"] for r in store.read("nodes").collect()} == got


def test_delete_group(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path))
    df = spark.createDataFrame(
        [("u1", "g1"), ("u2", "g2")], schema="uuid string, group_id string"
    )
    store.overwrite("nodes", df)
    store.delete_group(["g1"])
    assert [r["uuid"] for r in store.read("nodes").collect()] == ["u2"]


def _episodes(spark):
    rows = [
        (f"e{i}", "g1" if i < 4 else "g2", "text", ts(i)) for i in range(6)
    ]
    return spark.createDataFrame(
        rows, schema="uuid string, group_id string, source string, valid_at timestamp"
    )


def test_retrieve_episodes_window(spark):
    eps = _episodes(spark)
    got = retrieve_episodes(eps, ts(5), last_n=2).collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r["group_id"], []).append(r["uuid"])
    # last 2 with valid_at <= ts(5), chronological: g1 -> e2,e3; g2 -> e4,e5
    assert by_group == {"g1": ["e2", "e3"], "g2": ["e4", "e5"]}


def test_previous_episodes_bulk(spark):
    eps = _episodes(spark)
    got = {r["uuid"]: r["prev_uuids"] for r in previous_episodes_bulk(eps, last_n=2).collect()}
    assert got["e0"] == []
    assert got["e1"] == ["e0"]
    assert got["e3"] == ["e2", "e1"]  # most recent first
    assert got["e5"] == ["e4"]


def test_remove_episode_cascade(spark):
    eps = _episodes(spark)
    nodes = spark.createDataFrame(
        [("n1", "g1"), ("n2", "g1")], schema="uuid string, group_id string"
    )
    edges = spark.createDataFrame(
        [("ed1", "g1", ["e1", "e2"]), ("ed2", "g1", ["e2", "e1"])],
        schema="uuid string, group_id string, episodes array<string>",
    )
    mentions = spark.createDataFrame(
        [("m1", "g1", "e1", "n1"), ("m2", "g1", "e1", "n2"), ("m3", "g1", "e2", "n2")],
        schema="uuid string, group_id string, source_node_uuid string, target_node_uuid string",
    )
    out = remove_episode(eps, nodes, edges, mentions, "e1")
    assert "e1" not in {r["uuid"] for r in out["episodes"].collect()}
    # ed1 was created by e1 (first provenance) -> deleted; ed2 kept
    assert {r["uuid"] for r in out["edges"].collect()} == {"ed2"}
    # n1 mentioned only by e1 -> deleted; n2 also mentioned by e2 -> kept
    assert {r["uuid"] for r in out["nodes"].collect()} == {"n2"}
    assert {r["uuid"] for r in out["mentions"].collect()} == {"m3"}


def test_merge_upsert_partition_restricted(spark, tmp_path):
    """A micro-batch touching one group must not rewrite other partitions
    (O(touched partitions) I/O, the copy-on-write MERGE INTO shape)."""
    import os

    from graphiti_spark.store import ParquetStore

    store = ParquetStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("u1", "ga", 1), ("u2", "gb", 2)], schema="uuid string, group_id string, v long"
    )
    store.merge_upsert("t", base)
    gb_dir = os.path.join(store.path("t"), "group_id=gb")
    before = {f: os.path.getmtime(os.path.join(gb_dir, f)) for f in os.listdir(gb_dir)}

    updates = spark.createDataFrame(
        [("u1", "ga", 10), ("u3", "ga", 3)], schema="uuid string, group_id string, v long"
    )
    store.merge_upsert("t", updates)

    rows = {r["uuid"]: (r["group_id"], r["v"]) for r in store.read("t").collect()}
    assert rows == {"u1": ("ga", 10), "u2": ("gb", 2), "u3": ("ga", 3)}
    after = {f: os.path.getmtime(os.path.join(gb_dir, f)) for f in os.listdir(gb_dir)}
    assert after == before  # untouched partition: same files, same mtimes


def test_iceberg_merge_sql():
    from graphiti_spark.store import IcebergStore

    sql = IcebergStore.merge_sql(
        "cat.ns.edges",
        ["uuid", "group_id", "fact", "episodes"],
        key="uuid",
        array_merge_cols=("episodes",),
    )
    assert sql.startswith("MERGE INTO cat.ns.edges AS t USING __graphiti_updates AS u")
    assert "ON t.uuid = u.uuid" in sql
    assert "t.fact = u.fact" in sql
    assert "t.uuid = u.uuid " in sql and "SET t.uuid" not in sql  # key never SET
    assert (
        "t.episodes = array_sort(array_distinct(concat(coalesce(t.episodes, array()), "
        "coalesce(u.episodes, array()))))" in sql
    )
    assert sql.endswith("WHEN NOT MATCHED THEN INSERT *")


def test_iceberg_unavailable_in_sandbox(spark):
    from graphiti_spark.store import IcebergStore

    assert not IcebergStore.available(spark, "nosuch_catalog")


def test_recover_partition_level_old_dirs(spark, tmp_path):
    """ADVICE r2: a crash inside the per-partition swap loop leaves
    group_id=X__old dirs — recover() must restore them when the live dir is
    missing and delete them when the swap had completed (else partition
    discovery resurrects stale rows under a bogus 'X__old' group)."""
    import os
    import shutil

    store = ParquetStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("u1", "ga", 1), ("u2", "gb", 2)], schema="uuid string, group_id string, v long"
    )
    store.merge_upsert("t", base)
    root = store.path("t")

    # case 1: swap died between the renames — live dir gone, only __old left
    os.rename(os.path.join(root, "group_id=ga"), os.path.join(root, "group_id=ga__old"))
    rows = {r["uuid"]: r["group_id"] for r in store.read("t").collect()}
    assert rows == {"u1": "ga", "u2": "gb"}
    assert not os.path.isdir(os.path.join(root, "group_id=ga__old"))

    # case 2: swap completed but backup cleanup didn't — both dirs present
    shutil.copytree(os.path.join(root, "group_id=gb"), os.path.join(root, "group_id=gb__old"))
    rows = store.read("t").collect()
    assert {r["group_id"] for r in rows} == {"ga", "gb"}  # no 'gb__old' resurrection
    assert len(rows) == 2
    assert not os.path.isdir(os.path.join(root, "group_id=gb__old"))


def test_merge_upsert_null_group_falls_back_to_full_merge(spark, tmp_path):
    """ADVICE r2: updates containing null group_id can't use the
    partition-restricted path (the default partition isn't addressable by
    value) — pre-existing null-group rows must survive the merge."""
    store = ParquetStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("u1", "ga", 1), ("u2", None, 2)], schema="uuid string, group_id string, v long"
    )
    store.merge_upsert("t", base)
    updates = spark.createDataFrame(
        [("u3", None, 3)], schema="uuid string, group_id string, v long"
    )
    store.merge_upsert("t", updates)
    rows = {r["uuid"]: (r["group_id"], r["v"]) for r in store.read("t").collect()}
    assert rows == {"u1": ("ga", 1), "u2": (None, 2), "u3": (None, 3)}


def test_iceberg_sort_order_sql():
    from graphiti_spark.store import IcebergStore

    sql = IcebergStore.sort_order_sql("cat.ns.edges", ("group_id", "uuid"))
    assert sql == "ALTER TABLE cat.ns.edges WRITE ORDERED BY (group_id, uuid)"


def _partition_file_hashes(root, part):
    """(relpath -> md5) of every file under <root>/group_id=<part>."""
    import hashlib
    import os

    base = os.path.join(root, f"group_id={part}")
    out = {}
    for dirpath, _, files in os.walk(base):
        for fn in files:
            p = os.path.join(dirpath, fn)
            with open(p, "rb") as f:
                out[os.path.relpath(p, base)] = hashlib.md5(f.read()).hexdigest()
    return out


def test_overwrite_partitions_untouched_bytes(spark, tmp_path):
    """overwrite_partitions rewrites ONLY the named groups: other
    partitions' files stay byte-identical on disk, a group whose
    replacement frame is empty is deleted."""
    store = ParquetStore(spark, str(tmp_path))
    base = spark.createDataFrame(
        [("a1", "ga", 1), ("a2", "ga", 2), ("b1", "gb", 3), ("c1", "gc", 4)],
        schema="uuid string, group_id string, v long",
    )
    store.overwrite("t", base)
    untouched_before = _partition_file_hashes(store.path("t"), "gb")
    assert untouched_before

    # replace ga with one row; gc becomes empty (deleted)
    repl = spark.createDataFrame(
        [("a9", "ga", 9)], schema="uuid string, group_id string, v long"
    )
    store.overwrite_partitions("t", repl, ["ga", "gc"])

    rows = {r["uuid"]: (r["group_id"], r["v"]) for r in store.read("t").collect()}
    assert rows == {"a9": ("ga", 9), "b1": ("gb", 3)}
    assert _partition_file_hashes(store.path("t"), "gb") == untouched_before


def test_delete_table(spark, tmp_path):
    store = ParquetStore(spark, str(tmp_path))
    store.overwrite(
        "t", spark.createDataFrame([("u", "g", 1)], "uuid string, group_id string, v long")
    )
    assert store.exists("t")
    store.delete_table("t")
    assert not store.exists("t")
