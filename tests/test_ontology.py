"""§1.3 / E5 — type registry, edge-type-map enforcement, node summaries,
group-id validation."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from graphiti_spark.ontology import (
    DEFAULT_EDGE_NAME,
    TypeRegistry,
    enforce_edge_type_map,
    validate_group_id,
)
from graphiti_spark.operators.attributes import node_summaries


def test_validate_group_id():
    assert validate_group_id("g1_ok-2") == "g1_ok-2"
    for bad in ("", "has space", "dots.bad", "semi;colon"):
        with pytest.raises(ValueError):
            validate_group_id(bad)


def test_registry_reserved_name():
    reg = TypeRegistry()
    with pytest.raises(ValueError):
        reg.register_entity_type("Entity", StructType([]))


def _graph(spark):
    nodes = spark.createDataFrame(
        [
            ("n1", "g", ["Entity", "Person"]),
            ("n2", "g", ["Entity", "Organization"]),
            ("n3", "g", ["Entity", "Place"]),
        ],
        schema="uuid string, group_id string, labels array<string>",
    )
    edges = spark.createDataFrame(
        [
            ("e1", "g", "n1", "n2", "WORKS_AT"),   # allowed Person->Org
            ("e2", "g", "n1", "n3", "WORKS_AT"),   # Person->Place: not allowed
            ("e3", "g", "n2", "n3", "BASED_IN"),   # unregistered predicate: pass through
        ],
        schema="uuid string, group_id string, source_node_uuid string, "
        "target_node_uuid string, name string",
    )
    return nodes, edges


def test_enforce_edge_type_map(spark):
    nodes, edges = _graph(spark)
    reg = TypeRegistry()
    reg.register_edge_type("WORKS_AT", StructType([StructField("role", StringType())]))
    reg.allow("Person", "Organization", "WORKS_AT")
    out = {r["uuid"]: r["name"] for r in enforce_edge_type_map(edges, nodes, reg).collect()}
    assert out["e1"] == "WORKS_AT"
    assert out["e2"] == DEFAULT_EDGE_NAME  # reset: Person->Place not allowed
    assert out["e3"] == "BASED_IN"         # not a registered custom type


def test_enforce_noop_without_map(spark):
    nodes, edges = _graph(spark)
    out = enforce_edge_type_map(edges, nodes, TypeRegistry())
    assert {r["name"] for r in out.collect()} == {"WORKS_AT", "BASED_IN"}


def test_node_summaries(spark):
    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    nodes = spark.createDataFrame(
        [("n1", "g", None), ("n2", "g", None), ("lonely", "g", None)],
        schema="uuid string, group_id string, summary string",
    )
    edges = spark.createDataFrame(
        [
            ("e1", "n1", "n2", "alice works at acme.", ts),
            ("e2", "n1", "n2", "alice lives in springfield.", ts.replace(day=2)),
        ],
        schema="uuid string, source_node_uuid string, target_node_uuid string, "
        "fact string, valid_at timestamp",
    )
    out = {r["uuid"]: r["summary"] for r in node_summaries(nodes, edges).collect()}
    assert out["n1"] == "alice works at acme. alice lives in springfield."
    assert out["n1"] == out["n2"]
    assert out["lonely"] is None


def test_fill_node_attributes(spark):
    from graphiti_spark.operators.attributes import fill_node_attributes

    ts = datetime(2024, 1, 1, tzinfo=timezone.utc)
    nodes = spark.createDataFrame(
        [
            ("n1", "Alice Smith", "g", ["Entity", "Person"], {}),
            ("n2", "Acme Corp", "g", ["Entity", "Organization"], {}),
            ("n3", "Springfield", "g", ["Entity", "Place"], {}),
        ],
        schema="uuid string, name string, group_id string, labels array<string>, "
        "attributes map<string,string>",
    )
    edges = spark.createDataFrame(
        [
            ("e1", "n1", "n2", "WORKS_AT", ts),
            ("e2", "n1", "n3", "LIVES_IN", ts.replace(day=3)),
            # later WORKS_AT edge must lose to the earliest one
            ("e3", "n1", "n3", "WORKS_AT", ts.replace(day=5)),
        ],
        schema="uuid string, source_node_uuid string, target_node_uuid string, "
        "name string, valid_at timestamp",
    )
    reg = TypeRegistry()
    reg.register_entity_type(
        "Person",
        StructType([StructField("employer", StringType()), StructField("home", StringType())]),
    )
    reg.node_attribute_from_predicate("Person", "employer", "WORKS_AT")
    reg.node_attribute_from_predicate("Person", "home", "LIVES_IN")
    out = {r["uuid"]: r["attributes"] for r in fill_node_attributes(nodes, edges, reg).collect()}
    assert out["n1"] == {"employer": "Acme Corp", "home": "Springfield"}
    assert out["n2"] == {}  # no rule for Organization
    with pytest.raises(ValueError):
        reg.node_attribute_from_predicate("Person", "not_a_field", "X")
    with pytest.raises(ValueError):
        reg.node_attribute_from_predicate("Ghost", "employer", "X")


def test_fill_edge_attributes(spark):
    from graphiti_spark.operators.attributes import fill_edge_attributes

    edges = spark.createDataFrame(
        [
            ("e1", "WORKS_AT", "alice smith works at acme corp since 2021-03-04"),
            ("e2", "WORKS_AT", "bob works at globex corp"),
            ("e3", "LIVES_IN", "bob lives in springfield since 2020-01-01"),
        ],
        schema="uuid string, name string, fact string",
    )
    reg = TypeRegistry()
    reg.register_edge_type("WORKS_AT", StructType([StructField("since", StringType())]))
    reg.edge_attribute_from_fact("WORKS_AT", "since", r"since (\d{4}-\d{2}-\d{2})")
    out = {r["uuid"]: r["attributes"] for r in fill_edge_attributes(edges, reg).collect()}
    assert out["e1"] == {"since": "2021-03-04"}
    assert out["e2"] == {}  # pattern unmatched -> field absent
    assert out["e3"] == {}  # LIVES_IN has no registered rules


def test_pipeline_with_registry_fills_attributes(spark):
    """run_pipeline(registry=...) must fill attributes from the extracted
    graph itself (end-to-end E5/E6)."""
    from graphiti_spark.datagen import generate_web_pages
    from graphiti_spark.pipeline import run_pipeline
    from graphiti_spark.schemas import WEB_PAGES

    rows = generate_web_pages(n_pages=40, seed=7)
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=WEB_PAGES,
    )
    reg = TypeRegistry()
    reg.register_entity_type("Person", StructType([StructField("employer", StringType())]))
    reg.node_attribute_from_predicate("Person", "employer", "WORKS_AT")
    result = run_pipeline(spark, pages, with_embeddings=False, registry=reg)
    filled = (
        result["nodes"]
        .filter(F.array_contains("labels", "Person"))
        .filter(F.size(F.map_keys("attributes")) > 0)
        .collect()
    )
    assert filled, "expected at least one Person with a filled employer attribute"
    assert all("employer" in r["attributes"] for r in filled)


def test_node_summaries_truncates(spark):
    nodes = spark.createDataFrame([("n1", "g", None), ("n2", "g", None)],
                                  schema="uuid string, group_id string, summary string")
    long_fact = " ".join(f"w{i}" for i in range(600))
    edges = spark.createDataFrame(
        [("e1", "n1", "n2", long_fact, None)],
        schema="uuid string, source_node_uuid string, target_node_uuid string, "
        "fact string, valid_at timestamp",
    )
    out = {r["uuid"]: r["summary"] for r in node_summaries(nodes, edges).collect()}
    assert len(out["n1"].split()) == 250
