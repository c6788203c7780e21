"""Per-stage wall-clock profile of the full pipeline on the cached scaling
corpus. Diagnostic only (not a graded benchmark): one JVM, one run, prints
runner.metrics plus write/total wall so the expensive stage is identifiable.

Usage: taskset -c 0-7 python scripts/profile_stages.py [--cpus 8] [--pages 400000]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pages", type=int, default=400000)
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    from __spark_entry__ import _FIXED_NOW
    from graphiti_spark.datagen import distributed_pages
    from graphiti_spark.pipeline import run_pipeline
    from graphiti_spark.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "64")
    spark = get_spark("profile", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    pages_dir = os.path.join(tempfile.gettempdir(), f"graphiti_scale_pages_{args.pages}")
    if not os.path.exists(os.path.join(pages_dir, "_SUCCESS")):
        distributed_pages(spark, args.pages, seed=42, partitions=max(args.cpus * 2, 16)) \
            .write.mode("overwrite").parquet(pages_dir)
    pages = spark.read.parquet(pages_dir)

    if not args.no_warm:
        warm = run_pipeline(spark, pages.limit(20000), now=_FIXED_NOW)
        warm["edges"].count()
        warm["release"]()
        spark.catalog.clearCache()

    out_dir = tempfile.mkdtemp(prefix="graphiti_profile_")
    t0 = time.time()
    res = run_pipeline(spark, pages, now=_FIXED_NOW)
    t_pipe = time.time() - t0
    from concurrent.futures import ThreadPoolExecutor

    tw = time.time()
    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [
            pool.submit(
                lambda n=n: res[n].write.mode("overwrite").parquet(os.path.join(out_dir, n))
            )
            for n in ("nodes", "edges", "mentions")
        ]
        for f in futs:
            f.result()
    t_write = time.time() - tw
    n_triples = spark.read.parquet(os.path.join(out_dir, "edges")).count()
    shutil.rmtree(out_dir, ignore_errors=True)
    print(json.dumps({
        "cpus": args.cpus,
        "pages": args.pages,
        "stage_metrics": res["metrics"],
        "pipeline_sec": round(t_pipe, 2),
        "write_sec": round(t_write, 2),
        "total_sec": round(t_pipe + t_write, 2),
        "triples": n_triples,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
