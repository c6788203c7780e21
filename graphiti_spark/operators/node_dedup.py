"""D1-D14 — global entity resolution / canonicalization.

The reference resolves extracted nodes per episode against an in-memory
candidate index (exact normalized name -> else MinHash-LSH -> best Jaccard
>= 0.9; /root/reference/graphiti_core/utils/maintenance/
dedup_helpers.py:198-246) and collapses the resulting alias pairs with a
union-find (utils/bulk_utils.py:301-413). Episode-at-a-time indexing doesn't
distribute; the set-oriented equivalent is:

1. exact dedup is FREE: the pre-canonical node id is a content hash of
   (group_id, exact-normalized name), so equal names collide by construction
   — no join, no shuffle (D1, D8's exact index).
2. fuzzy dedup pairs only DISTINCT high-entropy names per group: shingles +
   minhash + LSH band keys via one vectorized pandas UDF, posexplode of the
   8 band keys, self-join on (group_id, band_pos, band_key) — the LSH
   shuffle (D4-D6) — then native array_intersect/array_union Jaccard >= 0.9
   (D7, D9).
3. connected components with min-id canonical (D13/D14).

Scale notes: the fuzzy stage's input is |distinct names per group|, orders
of magnitude below |mentions|. Band-key hot buckets (e.g. thousands of
near-identical product names) are bounded by LSH_BUCKET_CAP: buckets larger
than the cap are dropped, mirroring how LSH blocking is deliberately
approximate; AQE skew-join splitting covers moderate skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphiti_spark.functions.udfs import (
    name_features_udf,
    normalize_exact_col,
    normalize_fuzzy_col,
)
from graphiti_spark.kernels import JACCARD_THRESHOLD
from graphiti_spark.operators.connected_components import connected_components

LSH_BUCKET_CAP = 64  # max names sharing one (group, band) bucket before we skip it


def det_id_col(*cols):
    """JVM-side twin of extraction.det_id: sha1 of \\x1f-joined parts."""
    return F.sha1(F.concat_ws("\x1f", *cols))


def name_keys(raw_mentions: DataFrame) -> DataFrame:
    """Distinct (group_id, norm_exact) keys with their pre-canonical ids and
    a deterministic display name (min surface form)."""
    return (
        raw_mentions.select(
            "group_id",
            "name",
            "entity_type",
            normalize_exact_col(F.col("name")).alias("norm_exact"),
        )
        .groupBy("group_id", "norm_exact")
        .agg(
            F.min("name").alias("name"),
            F.sort_array(F.collect_set("entity_type")).alias("entity_types"),
        )
        .withColumn("pre_id", det_id_col(F.lit("node"), F.col("group_id"), F.col("norm_exact")))
    )


# Above this many distinct name keys the LSH band join runs distributed;
# below it the identical kernels run in-process on the driver (the probe
# already holds the data). Mirrors connected_components' scale-adaptive
# driver/distributed switch. Sized so the driver path stays sub-second:
# measured ~30s of serial Python at 100k keys (an Amdahl hole that cut
# N-vs-4N scaling efficiency in half), vs ~0.2s at 20k.
DRIVER_FUZZY_MAX_KEYS = 20_000


def _driver_fuzzy_pairs(rows) -> list[tuple[str, str]]:
    """In-process twin of the LSH band join below: same entropy gate,
    shingles, band keys, bucket cap and Jaccard >= 0.9 (kernels shared with
    the sequential oracle), so both paths emit identical pairs."""
    from collections import defaultdict

    from graphiti_spark import kernels as K

    shingle_of: dict[str, frozenset] = {}
    buckets: dict[tuple, list[str]] = defaultdict(list)
    for r in rows:
        nf = K.normalize_fuzzy(r["name"])
        if not K.has_high_entropy(nf):
            continue
        shingle_of[r["pre_id"]] = K.cached_shingles(nf)
        for pos, bk in enumerate(K.band_keys(nf)):
            buckets[(r["group_id"], pos, bk)].append(r["pre_id"])

    seen: set[tuple[str, str]] = set()
    out: list[tuple[str, str]] = []
    for ids in buckets.values():
        if len(ids) > LSH_BUCKET_CAP:
            continue  # hub-name skew guard, same cap as the band join
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a, b = (ids[i], ids[j]) if ids[i] < ids[j] else (ids[j], ids[i])
                if a == b or (a, b) in seen:
                    continue
                seen.add((a, b))
                if K.jaccard(shingle_of[a], shingle_of[b]) >= K.JACCARD_THRESHOLD:
                    out.append((a, b))
    return sorted(out)


def fuzzy_duplicate_pairs(
    keys: DataFrame,
    driver_threshold: int | None = None,
    known_count: int | None = None,
) -> DataFrame:
    """LSH band join + Jaccard >= 0.9 over high-entropy distinct names.
    Returns pairs(a, b) of pre_ids (a < b), within the same group only.

    Scale-adaptive: below `driver_threshold` distinct keys the pairs come
    from the in-process kernel twin (zero further jobs); above it the
    distributed LSH band join below runs. Callers that already counted the
    (persisted) keys pass `known_count` so the distributed path never pays
    a probe collect."""
    # None -> module constant, resolved at CALL time so tests can force the
    # distributed branch by monkeypatching DRIVER_FUZZY_MAX_KEYS to 0
    if driver_threshold is None:
        driver_threshold = DRIVER_FUZZY_MAX_KEYS
    if driver_threshold > 0:
        if known_count is not None:
            if known_count > driver_threshold:
                sample = None
            else:
                sample = keys.select("group_id", "pre_id", "name").collect()
        else:
            sample = (
                keys.select("group_id", "pre_id", "name")
                .limit(driver_threshold + 1)
                .collect()
            )
            if len(sample) > driver_threshold:
                sample = None
        if sample is not None:
            spark = keys.sparkSession
            return spark.createDataFrame(
                _driver_fuzzy_pairs(sample), schema="a string, b string"
            )

    feat = (
        keys.withColumn("norm_fuzzy", normalize_fuzzy_col(F.col("name")))
        .withColumn("f", name_features_udf(F.col("norm_fuzzy")))
        .filter(F.col("f.is_high_entropy"))
        .select(
            "group_id",
            "pre_id",
            F.col("f.shingles").alias("shingles"),
            F.col("f.band_keys").alias("band_keys"),
        )
    )
    banded = feat.select(
        "group_id",
        "pre_id",
        "shingles",
        F.posexplode("band_keys").alias("band_pos", "band_key"),
    ).persist()  # consumed by the size aggregation AND both pair-join sides
    banded.count()  # eager: all three consumers appear in downstream actions
    # cap pathological buckets (hub-name skew guard); the capped frame is
    # NOT re-persisted — both self-join sides re-derive it from the cached
    # `banded` with one cheap broadcast-size join each, which costs less
    # than a second eager persist+count barrier
    bucket_sizes = banded.groupBy("group_id", "band_pos", "band_key").count()
    banded = banded.join(
        bucket_sizes.filter(F.col("count") <= LSH_BUCKET_CAP).drop("count"),
        on=["group_id", "band_pos", "band_key"],
    )
    a = banded.select(
        "group_id",
        "band_pos",
        "band_key",
        F.col("pre_id").alias("a"),
        F.col("shingles").alias("sh_a"),
    )
    b = banded.select(
        "group_id",
        "band_pos",
        "band_key",
        F.col("pre_id").alias("b"),
        F.col("shingles").alias("sh_b"),
    )
    pairs = (
        a.join(b, on=["group_id", "band_pos", "band_key"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sh_a", "sh_b")
        .dropDuplicates(["a", "b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jacc = F.when(union > 0, inter / union).otherwise(F.lit(1.0))
    return pairs.withColumn("jaccard", jacc).filter(
        F.col("jaccard") >= F.lit(JACCARD_THRESHOLD)
    ).select("a", "b")


def resolve_names(
    raw_mentions: DataFrame,
    existing_nodes: DataFrame | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Global canonicalization map: one row per distinct (group_id, name key).

    `cache_registry`: optional list the internal key cache is appended to,
    so a long-lived caller (streaming foreachBatch) can unpersist it after
    the resolution output is materialized.

    Returns name_resolution(group_id, norm_exact, name, entity_types,
    canonical_id) — the D15 pointer-rewrite map.

    With `existing_nodes` (the current canonical nodes snapshot: uuid,
    group_id, name, aliases) this is the reference's D11 — new mentions
    resolve AGAINST the existing graph: exact alias hits adopt the existing
    uuid outright; fuzzy pairs may link a new name into an existing
    component, and the existing uuid always wins as canonical (the directed
    alias->canonical rule of bulk_utils.py:72-101 — an established node is
    never re-pointed at a new one).
    """
    keys = name_keys(raw_mentions)

    if existing_nodes is not None:
        ex_keys = (
            existing_nodes.select(
                "group_id",
                F.col("uuid").alias("ex_uuid"),
                "name",
                F.explode("aliases").alias("norm_exact"),
            )
        )
        # exact alias hit: adopt the existing canonical uuid directly.
        # One ex_uuid per key: if two existing nodes ever share an alias
        # (possible after an existing-existing fuzzy merge upstream), the
        # min uuid wins — without this the join fans out and duplicates
        # every downstream mention of the shared alias.
        ex_exact = ex_keys.groupBy("group_id", "norm_exact").agg(
            F.min("ex_uuid").alias("ex_uuid")
        )
        keys = keys.join(ex_exact, on=["group_id", "norm_exact"], how="left")
        # names not exactly known enter the fuzzy pool together with the
        # existing nodes' primary keys so LSH can link new->existing
        ex_pool = (
            ex_keys.groupBy("group_id", "ex_uuid")
            .agg(F.min("name").alias("name"), F.min("norm_exact").alias("norm_exact"))
            .select(
                "group_id",
                "norm_exact",
                "name",
                F.array().cast("array<string>").alias("entity_types"),
                F.col("ex_uuid").alias("pre_id"),
            )
        )
        new_pool = keys.filter(F.col("ex_uuid").isNull()).select(
            "group_id", "norm_exact", "name", "entity_types", "pre_id"
        )
        pairs = fuzzy_duplicate_pairs(new_pool.unionByName(ex_pool))
        # existing uuids must win as canonical: prefix-priority remap — an
        # existing id sorts before any content-hash pre_id via a marker
        ex_ids = existing_nodes.select(F.col("uuid").alias("id")).distinct()
        canon = connected_components(pairs)
        # choose per component: min existing member if any, else min member
        member_flag = canon.join(
            ex_ids.withColumn("is_ex", F.lit(1)), on="id", how="left"
        )
        comp_best = (
            member_flag.groupBy("canonical")
            .agg(
                F.min(F.when(F.col("is_ex") == 1, F.col("id"))).alias("best_ex"),
                F.min("id").alias("best_any"),
            )
            .select(
                "canonical",
                F.coalesce(F.col("best_ex"), F.col("best_any")).alias("final_canon"),
            )
        )
        canon = canon.join(comp_best, on="canonical").select(
            "id", F.col("final_canon").alias("canonical")
        )
        resolved = keys.join(canon, keys.pre_id == canon.id, how="left").select(
            "group_id",
            "norm_exact",
            "name",
            "entity_types",
            F.coalesce(F.col("ex_uuid"), F.col("canonical"), F.col("pre_id")).alias(
                "canonical_id"
            ),
        )
        return resolved

    # keys feed the fuzzy pairing AND the final resolution join: persist +
    # one count dedupes the distinct-names aggregation (the expensive scan
    # over all mentions) and picks the fuzzy path without a probe collect
    keys = keys.persist()
    if cache_registry is not None:
        cache_registry.append(keys)
    n_keys = keys.count()
    pairs = fuzzy_duplicate_pairs(keys, known_count=n_keys)
    canon = connected_components(pairs)  # (id, canonical) for paired ids only

    return keys.join(canon, keys.pre_id == canon.id, how="left").select(
        "group_id",
        "norm_exact",
        "name",
        "entity_types",
        F.coalesce(F.col("canonical"), F.col("pre_id")).alias("canonical_id"),
    )


def duplicate_pair_edges(resolution: DataFrame, now=None) -> DataFrame:
    """IS_DUPLICATE_OF provenance pairs (ref edge_operations.py:609-670,
    the duplicate-pair writes of node_db_queries): one row per resolution
    key whose pre-canonical id lost to a different canonical —
    (duplicate pre_id) -[IS_DUPLICATE_OF]-> (canonical uuid) — so a
    reference user can query which raw names folded into which entity
    instead of reading the canonical node's `aliases` array.

    Filter-existing semantics on incremental runs come for free: with
    `existing_nodes`, `resolution` covers only the NEW batch's keys, so
    pairs are new->new or new->existing, never existing->existing (the
    reference also only writes pairs for the episode's extracted nodes).

    `canonical_name` mirrors build_canonical_nodes' norm_name (min
    norm_exact over the component's resolution rows; for a new->existing
    pair that is the min over the batch's names resolving there, the
    established node's own name being already on the nodes table).

    100 TB posture: input is the distinct-keys resolution table (orders of
    magnitude below |mentions|); one groupBy + equi-join on canonical_id,
    no collect, no new shuffles beyond the small aggregation."""
    keyed = resolution.withColumn(
        "pre_id", det_id_col(F.lit("node"), F.col("group_id"), F.col("norm_exact"))
    )
    canon_names = keyed.groupBy("canonical_id").agg(
        F.min("norm_exact").alias("canonical_name")
    )
    # the canonical row's OWN key name (null when the canonical is an
    # existing node from a prior batch — its name lives on the nodes table)
    canon_keys = keyed.select(
        F.col("pre_id").alias("canonical_id"),
        F.col("norm_exact").alias("canonical_key_name"),
    )
    out = (
        keyed.filter(F.col("pre_id") != F.col("canonical_id"))
        .join(canon_names, on="canonical_id")
        .join(canon_keys, on="canonical_id", how="left")
        .select(
            det_id_col(
                F.lit("dupedge"),
                F.col("group_id"),
                F.col("pre_id"),
                F.col("canonical_id"),
            ).alias("uuid"),
            "group_id",
            F.col("pre_id").alias("source_node_uuid"),
            F.col("canonical_id").alias("target_node_uuid"),
            F.lit("IS_DUPLICATE_OF").alias("name"),
            F.col("norm_exact").alias("duplicate_name"),
            "canonical_name",
            "canonical_key_name",
        )
    )
    if now is not None:
        out = out.withColumn("created_at", F.lit(now).cast("timestamp"))
    else:
        out = out.withColumn("created_at", F.lit(None).cast("timestamp"))
    return out


def build_canonical_nodes(resolution: DataFrame, raw_mentions: DataFrame) -> DataFrame:
    """canonical_nodes(uuid, name, group_id, labels, created_at, norm_name,
    aliases, summary, attributes) — one row per canonical entity; norm_name
    is the min normalized alias (component-stable identity for P/R scoring);
    created_at = first mention time (deterministic replacement of utc_now)."""
    first_seen = (
        raw_mentions.select(
            "group_id",
            normalize_exact_col(F.col("name")).alias("norm_exact"),
            "ep_valid_at",
        )
        .groupBy("group_id", "norm_exact")
        .agg(F.min("ep_valid_at").alias("first_seen_at"))
    )

    return (
        resolution.join(first_seen, on=["group_id", "norm_exact"])
        .groupBy(F.col("canonical_id").alias("uuid"), "group_id")
        .agg(
            F.min(F.struct("norm_exact", "name")).alias("best"),
            F.min("norm_exact").alias("norm_name"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("entity_types")))).alias(
                "types"
            ),
            F.min("first_seen_at").alias("created_at"),
            F.sort_array(F.collect_set("norm_exact")).alias("aliases"),
        )
        .select(
            "uuid",
            F.col("best.name").alias("name"),
            "group_id",
            F.concat(F.array(F.lit("Entity")), F.col("types")).alias("labels"),
            "created_at",
            "norm_name",
            "aliases",
            F.lit(None).cast("string").alias("summary"),
            F.create_map().cast("map<string,string>").alias("attributes"),
        )
    )
