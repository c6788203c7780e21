"""Physical-plan quality gates: predicate pushdown, column pruning and
broadcast-join selection must survive refactors (the 100 TB posture)."""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from graphiti_spark.datagen import generate_web_pages
from graphiti_spark.pipeline import pages_to_episodes, run_pipeline
from graphiti_spark.schemas import WEB_PAGES

NOW = datetime(2026, 8, 16, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plans") / "pages")
    rows = generate_web_pages(n_pages=60, seed=42)
    spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=WEB_PAGES,
    ).write.mode("overwrite").parquet(path)
    return path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lang_filter_pushed_to_scan(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    eps = pages_to_episodes(pages, lang="en")
    plan = _plan(eps)
    assert "PushedFilters" in plan and "lang" in plan.split("PushedFilters")[1][:200], (
        "lang filter must reach the parquet scan"
    )


def test_column_pruning_drops_html_when_text_only(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    # a projection that only needs url/text must not read html bytes
    df = pages.select("url", F.length("text").alias("n"))
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "html" not in read_schema, f"html must be pruned: {read_schema}"


def test_distributed_fuzzy_band_join_no_cartesian(spark, pages_path):
    """The distributed LSH leg (what runs at 100x) must pair names through
    the (group, band_pos, band_key) equi-join — a plan regression to a
    cartesian/nested-loop would be quadratic in distinct names."""
    from graphiti_spark.functions.udfs import extract_mentions_df
    from graphiti_spark.operators.node_dedup import fuzzy_duplicate_pairs, name_keys

    pages = spark.read.parquet(pages_path)
    keys = name_keys(extract_mentions_df(pages_to_episodes(pages)))
    pairs = fuzzy_duplicate_pairs(keys, driver_threshold=0)  # force distributed
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_duplicate_pair_edges_no_cartesian(spark, pages_path):
    """The IS_DUPLICATE_OF derivation joins the resolution table to its own
    small aggregations on canonical_id — equi-joins only."""
    from graphiti_spark.operators.node_dedup import duplicate_pair_edges

    pages = spark.read.parquet(pages_path)
    res = run_pipeline(spark, pages, now=NOW, with_embeddings=False)
    plan = _plan(duplicate_pair_edges(res["name_resolution"], now=NOW))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pointer_rewrite_uses_broadcast(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    res = run_pipeline(spark, pages, now=NOW, with_embeddings=False)
    # the canonical-map joins (D15) must broadcast the small map side
    from graphiti_spark.operators.edge_ops import rewrite_pointers
    from graphiti_spark.functions.udfs import split_extraction

    rr = rewrite_pointers(res["raw_triples"], res["name_resolution"])
    plan = _plan(rr)
    assert "BroadcastHashJoin" in plan, "D15 map join must broadcast"
    assert "CartesianProduct" not in plan


def test_no_cartesian_in_pipeline_outputs(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    res = run_pipeline(spark, pages, now=NOW, with_embeddings=False)
    for name in ("nodes", "edges", "mentions"):
        assert "CartesianProduct" not in _plan(res[name]), name


def test_merge_pair_join_is_equijoin_no_cartesian(spark):
    """T4/T5: the near-dup candidate join must hash/sort-merge on the
    endpoint-pair key, never a cartesian, and the token/vector payloads
    must not appear in the join condition."""
    from graphiti_spark.extraction import embed_text
    from graphiti_spark.operators.edge_ops import near_duplicate_edge_pairs

    edges = spark.createDataFrame(
        [("e%d" % i, "g", "n1", "n2", "fact %d here" % i, embed_text("fact %d" % i))
         for i in range(6)],
        schema="uuid string, group_id string, source_node_uuid string, "
        "target_node_uuid string, fact string, fact_embedding array<float>",
    )
    plan = _plan(near_duplicate_edge_pairs(edges))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan


def test_prefix_filter_join_is_equijoin_no_cartesian(spark):
    """The prefix-filtered set-similarity candidate join must stay a
    (block, token-hash) equi-join — never a cartesian/BNL — and the
    exchanged candidate rows must carry only scalars (the wide token
    arrays are re-attached after dedup)."""
    from graphiti_spark import dataops as D

    docs = spark.createDataFrame(
        [(i, f"w{i} common tail {i % 3}", "en") for i in range(50)],
        schema="doc_id long, text string, lang string",
    )
    out = D.token_jaccard_pairs(docs, threshold=0.6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_broadcasts_test_grams(spark):
    """The decontamination join must broadcast the (small) distinct
    test-gram side so the train grams stream through a map-side hash join
    with no shuffle of the train side."""
    from graphiti_spark import dataops as D

    train = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta eta theta " + str(i)) for i in range(20)],
        schema="doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta tail")],
        schema="doc_id long, text string",
    )
    plan = _plan(D.ngram_decontaminate(train, test, n=8))
    assert "BroadcastHashJoin" in plan, "test-gram side must broadcast"
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_line_dedup_no_cartesian(spark):
    """Winner marking is one equi-join on the line content (partial-agg
    min absorbs hot-line skew map-side); no cartesian/BNL anywhere."""
    from graphiti_spark import dataops as D

    docs = spark.createDataFrame(
        [(i, "header\nbody " + str(i)) for i in range(10)],
        schema="doc_id long, text string",
    )
    plan = _plan(D.line_dedup(docs))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
