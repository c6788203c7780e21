"""Per-stage N-vs-4N scaling diagnostic (not a graded benchmark).

Materializes the pipeline's intermediate tables ONCE (episodes parquet,
deduped+embedded edges parquet) from the cached 400k-page corpus, then
times individual heavy stages at two pinned core counts in fresh JVMs.
Separates "which stage stops scaling" from end-to-end noise.

Usage: python scripts/bench_stage_scaling.py [--pages 400000] [--n 2]
       [--stages extract,dedup,invalidate,canon,write]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

PREP = r"""
import os, sys, tempfile
sys.path.insert(0, "/root/repo")
from __spark_entry__ import _FIXED_NOW
from graphiti_spark.session import get_spark
from graphiti_spark.pipeline import pages_to_episodes
from graphiti_spark.operators.edge_ops import dedup_edges
from graphiti_spark.operators.node_dedup import resolve_names
from graphiti_spark.operators.edge_ops import rewrite_pointers
from graphiti_spark.functions.udfs import extract_all_df, split_extraction, embed_udf
from pyspark.sql import functions as F

n_pages = int(os.environ["STAGE_PAGES"])
pages_dir = os.environ["STAGE_PAGES_DIR"]
work = os.environ["STAGE_WORK_DIR"]

spark = get_spark("stage_prep", master="local[32]")
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(pages_dir)
eps = pages_to_episodes(pages)
eps.write.mode("overwrite").parquet(os.path.join(work, "episodes"))
eps = spark.read.parquet(os.path.join(work, "episodes"))
raw_all = extract_all_df(eps)
raw_all.write.mode("overwrite").parquet(os.path.join(work, "raw_all"))
raw_all = spark.read.parquet(os.path.join(work, "raw_all"))
raw_mentions, raw_triples = split_extraction(raw_all)
res = resolve_names(raw_mentions)
res.write.mode("overwrite").parquet(os.path.join(work, "resolution"))
res = spark.read.parquet(os.path.join(work, "resolution"))
resolved = rewrite_pointers(raw_triples, res)
deduped = dedup_edges(resolved).withColumn("fact_embedding", embed_udf(F.col("fact")))
deduped.write.mode("overwrite").parquet(os.path.join(work, "deduped"))
print("PREP_DONE")
spark.stop()
"""

STAGE = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, "/root/repo")
from __spark_entry__ import _FIXED_NOW
from graphiti_spark.session import get_spark
from pyspark.sql import functions as F

cpus = int(os.environ["STAGE_CPUS"])
stage = os.environ["STAGE_NAME"]
work = os.environ["STAGE_WORK_DIR"]

spark = get_spark("stage_bench", master=f"local[{cpus}]")
spark.sparkContext.setLogLevel("ERROR")

def timed(fn):
    # warm codegen/Python workers on a slice first
    t0 = time.time(); fn(); return time.time() - t0

if stage == "extract":
    from graphiti_spark.functions.udfs import extract_all_df
    eps = spark.read.parquet(os.path.join(work, "episodes"))
    extract_all_df(eps.limit(5000)).count()
    sec = timed(lambda: extract_all_df(eps).count())
elif stage == "dedup":
    from graphiti_spark.operators.edge_ops import dedup_edges, rewrite_pointers
    from graphiti_spark.functions.udfs import split_extraction, embed_udf
    raw_all = spark.read.parquet(os.path.join(work, "raw_all"))
    res = spark.read.parquet(os.path.join(work, "resolution"))
    _, raw_triples = split_extraction(raw_all)
    resolved = rewrite_pointers(raw_triples, res)
    d = dedup_edges(resolved).withColumn("fact_embedding", embed_udf(F.col("fact")))
    d.limit(2000).count()
    sec = timed(lambda: d.write.mode("overwrite").parquet(os.path.join(work, f"_out_dedup_{cpus}")))
elif stage == "dedup_noembed":
    from graphiti_spark.operators.edge_ops import dedup_edges, rewrite_pointers
    from graphiti_spark.functions.udfs import split_extraction
    raw_all = spark.read.parquet(os.path.join(work, "raw_all"))
    res = spark.read.parquet(os.path.join(work, "resolution"))
    _, raw_triples = split_extraction(raw_all)
    resolved = rewrite_pointers(raw_triples, res)
    d = dedup_edges(resolved)
    d.limit(2000).count()
    sec = timed(lambda: d.write.mode("overwrite").parquet(os.path.join(work, f"_out_dedupne_{cpus}")))
elif stage == "invalidate":
    from graphiti_spark.operators.edge_ops import invalidation_map
    deduped = spark.read.parquet(os.path.join(work, "deduped"))
    n = deduped.count()
    sec = timed(lambda: invalidation_map(deduped, known_edge_count=n).count())
elif stage == "canon":
    from graphiti_spark.operators.edge_ops import near_dup_canonical_map
    deduped = spark.read.parquet(os.path.join(work, "deduped"))
    n = deduped.count()
    sec = timed(lambda: near_dup_canonical_map(deduped, known_edge_count=n)[0].count())
elif stage == "write":
    deduped = spark.read.parquet(os.path.join(work, "deduped"))
    deduped.limit(2000).count()
    sec = timed(lambda: deduped.write.mode("overwrite").parquet(os.path.join(work, f"_out_write_{cpus}")))
else:
    raise SystemExit(f"unknown stage {stage}")

print("STAGE_RESULT " + json.dumps({"stage": stage, "cpus": cpus, "sec": round(sec, 2)}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=400000)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--stages", default="extract,dedup,dedup_noembed,invalidate,canon,write")
    args = ap.parse_args()

    pages_dir = os.path.join(tempfile.gettempdir(), f"graphiti_scale_pages_{args.pages}")
    work = os.path.join(tempfile.gettempdir(), f"graphiti_stage_work_{args.pages}")
    env = dict(os.environ)
    env.update({
        "STAGE_PAGES": str(args.pages),
        "STAGE_PAGES_DIR": pages_dir,
        "STAGE_WORK_DIR": work,
        "SPARK_GRAFT_SHUFFLE": "64",
    })
    if not os.path.exists(os.path.join(work, "deduped", "_SUCCESS")):
        os.makedirs(work, exist_ok=True)
        p = subprocess.run([sys.executable, "-c", PREP], env=env, capture_output=True, text=True)
        if "PREP_DONE" not in p.stdout:
            raise RuntimeError(p.stdout[-1500:] + p.stderr[-1500:])

    results = []
    for stage in args.stages.split(","):
        for cpus in (args.n, args.n * 4):
            e = dict(env)
            e.update({"STAGE_CPUS": str(cpus), "STAGE_NAME": stage})
            cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c", STAGE]
            p = subprocess.run(cmd, env=e, capture_output=True, text=True, timeout=3000)
            for line in p.stdout.splitlines():
                if line.startswith("STAGE_RESULT "):
                    results.append(json.loads(line[len("STAGE_RESULT "):]))
                    break
            else:
                print(f"FAILED {stage}@{cpus}: {p.stdout[-800:]} {p.stderr[-800:]}")
        if len(results) >= 2 and results[-1]["stage"] == stage and results[-2]["stage"] == stage:
            lo, hi = results[-2], results[-1]
            print(json.dumps({
                "stage": stage, f"sec_{args.n}": lo["sec"], f"sec_{args.n*4}": hi["sec"],
                "speedup": round(lo["sec"] / hi["sec"], 2),
                "efficiency": round(lo["sec"] / hi["sec"] / 4, 3),
                "load": round(os.getloadavg()[0], 2),
            }))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
