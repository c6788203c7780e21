"""Explicit hub-key salting (north-rule requirement) — used where a join
key is dominated by a few hub entities (high-degree URLs / organizations)
and the small side cannot be broadcast.

Strategy (classic split-hot-keys salting, complementary to AQE's skew-join
splitting which only helps sort-merge joins AQE can observe):

1. count left-side keys; keys with count > hot_threshold are "hot"
   (collected — by construction there are few of them);
2. cold keys join normally;
3. hot keys: the LEFT side gets a salt column pmod(xxhash64(salt_col), S)
   so each hot key's rows spread over S shuffle partitions; the RIGHT side
   is replicated S times (explode over the salt range);
4. union cold + hot results.

The result is row-identical to the plain join — verified by
tests/test_skew.py — while the per-task row count for a hot key drops by S.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALT = 8
DEFAULT_HOT_THRESHOLD = 10_000


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    salt_col: str,
    how: str = "inner",
    num_salts: int = DEFAULT_SALT,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    known_left_count: int | None = None,
    probe_sample: float | None = None,
    probe_frame: DataFrame | None = None,
) -> DataFrame:
    """Join `left` and `right` on `on`, salting keys that are hot on the
    left side. `salt_col` must be a left-side column whose hash spreads a
    hot key's rows (e.g. the row uuid). Only inner/left joins supported.

    `known_left_count`: callers that already materialized the left side
    (e.g. a checkpointed pipeline stage) can pass its row count; when the
    WHOLE left side is at or below `hot_threshold` no key can possibly be
    hot, so the hot-key detection job is skipped outright.

    `probe_sample`: run hot-key DETECTION on a row sample instead of the
    full left side (the full-table groupBy probe costs a complete shuffle
    that is pure overhead on corpora with no hubs — measured ~10s on the
    2M-edge scaling corpus). A key with > hot_threshold rows appears
    > hot_threshold*f times in expectation; the /2 cutoff margin makes a
    miss astronomically unlikely (Poisson tail), and a false positive only
    salts a warm-but-not-hot key — the join result is row-identical on
    every path, only the partition layout changes.

    `probe_frame`: frame to run hot-key detection against instead of
    `left` — callers whose left side is an expensive derivation (e.g. a
    windowed self-join side) pass the cheap cached parent, which has the
    same key distribution.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")

    if known_left_count is not None and known_left_count <= hot_threshold:
        return left.join(right, on=on, how=how)

    probe = probe_frame if probe_frame is not None else left
    if probe_sample is not None:
        counts = probe.sample(False, probe_sample, seed=7).groupBy(*on).count()
        cutoff = max(1.0, hot_threshold * probe_sample / 2.0)
    else:
        counts = probe.groupBy(*on).count()
        cutoff = float(hot_threshold)
    # hot keys are few by construction (they are the skew), so collecting
    # them is cheap and avoids holding a persisted frame for the join's
    # lifetime (a leak under streaming foreachBatch)
    hot_rows = counts.filter(F.col("count") > cutoff).drop("count").collect()
    if not hot_rows:
        return left.join(right, on=on, how=how)
    hot_keys = left.sparkSession.createDataFrame(hot_rows, schema=left.select(*on).schema)

    hk = F.broadcast(hot_keys)
    left_hot = left.join(hk, on=on, how="left_semi")
    left_cold = left.join(hk, on=on, how="left_anti")
    right_hot = right.join(hk, on=on, how="left_semi")
    right_cold = right.join(hk, on=on, how="left_anti")

    cold = left_cold.join(right_cold, on=on, how=how)

    lh = left_hot.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(num_salts)))
    rh = right_hot.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.lit(num_salts - 1).cast("bigint"))),
    )
    hot = lh.join(rh, on=[*on, "_salt"], how=how).drop("_salt")

    return cold.unionByName(hot)
