"""§1.3 schema system — custom entity/edge type registry + edge-type-map
enforcement, and input validation (U6).

The reference lets callers register Pydantic entity/edge types and an
`edge_type_map: dict[tuple[src_label, dst_label], list[predicate]]`
constraining which predicates may connect which node labels; a custom
predicate not allowed for its endpoints is reset to the default RELATES_TO
(/root/reference/graphiti_core/graphiti.py:393-397,
utils/maintenance/edge_operations.py:46, :335-347, 563-572; validation in
helpers.py:119-176). Here the registry is a plain dict of StructTypes and
enforcement is one broadcast join against the small
(src_label, dst_label, predicate) allow-table.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

DEFAULT_EDGE_NAME = "RELATES_TO"  # ref edge_operations.py:46

_GROUP_ID_RE = re.compile(r"^[a-zA-Z0-9_-]+$")  # ref helpers.py:119-142


def validate_group_id(group_id: str) -> str:
    """U6: group ids are [a-zA-Z0-9_-]+ (ref helpers.py:119-142)."""
    if not group_id or not _GROUP_ID_RE.match(group_id):
        raise ValueError(f"invalid group_id: {group_id!r}")
    return group_id


class TypeRegistry:
    """Custom entity/edge types: {type_name: StructType of attributes}."""

    def __init__(self) -> None:
        self.entity_types: dict[str, StructType] = {}
        self.edge_types: dict[str, StructType] = {}
        # [(src_label, dst_label, predicate)] allow-list; empty = allow all
        self.edge_type_map: list[tuple[str, str, str]] = []
        # E5 deterministic attribute rules: (entity_label, field) -> the
        # predicate whose object fills the field (the LLM-free analog of the
        # reference's per-type Pydantic attribute extraction,
        # ref node_operations.py:402-506)
        self.node_attribute_rules: dict[tuple[str, str], str] = {}
        # E6: (edge_type, field) -> regex with ONE capture group applied to
        # the fact text (ref edge_operations.py:547-562 extracts the custom
        # type's fields from the fact/episode with a small-model call)
        self.edge_attribute_rules: dict[tuple[str, str], str] = {}

    def register_entity_type(self, name: str, schema: StructType) -> None:
        if name in ("Entity",):
            raise ValueError("'Entity' is reserved")  # ref entity_types_utils
        self.entity_types[name] = schema

    def register_edge_type(self, name: str, schema: StructType) -> None:
        self.edge_types[name] = schema

    def allow(self, src_label: str, dst_label: str, predicate: str) -> None:
        self.edge_type_map.append((src_label, dst_label, predicate))

    def node_attribute_from_predicate(self, label: str, field: str, predicate: str) -> None:
        """Fill `field` of entities labeled `label` with the canonical name
        of the object of their earliest `predicate` edge."""
        if label not in self.entity_types:
            raise ValueError(f"unregistered entity type: {label!r}")
        if field not in {f.name for f in self.entity_types[label].fields}:
            raise ValueError(f"{field!r} is not a field of entity type {label!r}")
        self.node_attribute_rules[(label, field)] = predicate

    def edge_attribute_from_fact(self, edge_type: str, field: str, pattern: str) -> None:
        """Fill `field` of edges named `edge_type` with the first capture
        group of `pattern` matched against the fact text."""
        if edge_type not in self.edge_types:
            raise ValueError(f"unregistered edge type: {edge_type!r}")
        if field not in {f.name for f in self.edge_types[edge_type].fields}:
            raise ValueError(f"{field!r} is not a field of edge type {edge_type!r}")
        self.edge_attribute_rules[(edge_type, field)] = pattern


def enforce_edge_type_map(
    edges: DataFrame,
    nodes: DataFrame,
    registry: TypeRegistry,
) -> DataFrame:
    """Reset custom predicates that are not allowed between their endpoint
    labels to RELATES_TO (ref edge_operations.py:563-572).

    Only predicates registered as custom edge types are constrained —
    free-form predicates pass through, exactly like the reference (it only
    gates `edge_types` entries). One broadcast join per endpoint for the
    label lookup, one against the allow-table.
    """
    if not registry.edge_type_map or not registry.edge_types:
        return edges
    spark = edges.sparkSession
    allow = F.broadcast(
        spark.createDataFrame(
            registry.edge_type_map, schema="src_label string, dst_label string, name string"
        ).withColumn("_allowed", F.lit(1))
    )
    labels = nodes.select(
        F.col("uuid").alias("_n_uuid"), F.col("labels").alias("_n_labels")
    )
    custom = list(registry.edge_types.keys())

    out = (
        edges.join(
            labels.withColumnRenamed("_n_uuid", "source_node_uuid").withColumnRenamed(
                "_n_labels", "_src_labels"
            ),
            on="source_node_uuid",
            how="left",
        )
        .join(
            labels.withColumnRenamed("_n_uuid", "target_node_uuid").withColumnRenamed(
                "_n_labels", "_dst_labels"
            ),
            on="target_node_uuid",
            how="left",
        )
    )
    # allowed iff ANY (src_label, dst_label) pair of the endpoints' label
    # sets is in the allow table for this predicate
    exploded = out.select(
        F.col("uuid").alias("_e_uuid"),
        "name",
        F.explode_outer("_src_labels").alias("src_label"),
        F.col("_dst_labels"),
    ).select(
        "_e_uuid", "name", "src_label", F.explode_outer("_dst_labels").alias("dst_label")
    )
    allowed = (
        exploded.join(allow, on=["src_label", "dst_label", "name"], how="inner")
        .select("_e_uuid")
        .distinct()
        .withColumn("_ok", F.lit(1))
    )
    return (
        out.join(allowed, out.uuid == allowed._e_uuid, how="left")
        .withColumn(
            "name",
            F.when(
                F.col("name").isin(custom) & F.col("_ok").isNull(),
                F.lit(DEFAULT_EDGE_NAME),
            ).otherwise(F.col("name")),
        )
        .drop("_e_uuid", "_ok", "_src_labels", "_dst_labels")
    )
