#!/bin/sh
# Reproducible attempt to vendor iceberg-spark-runtime into this sandbox.
set -x
date -u
# 1. PyPI (any index configured for this host)
pip download iceberg-spark-runtime 2>&1 | tail -4
pip download pyiceberg 2>&1 | tail -4
# 2. Maven Central directly
curl -sS --max-time 15 -o /tmp/iceberg.jar \
  https://repo1.maven.org/maven2/org/apache/iceberg/iceberg-spark-runtime-4.0_2.13/1.10.0/iceberg-spark-runtime-4.0_2.13-1.10.0.jar ; echo "curl rc=$?"
# 3. Spark's own --packages resolver (ivy, needs Maven Central)
timeout 60 python - <<'PY' 2>&1 | tail -6
from pyspark.sql import SparkSession
try:
    s = (SparkSession.builder.master("local[1]")
         .config("spark.jars.packages",
                 "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0")
         .getOrCreate())
    print("session up (unexpected)")
except Exception as e:
    print("FAILED:", type(e).__name__, str(e)[:500])
PY
# 4. any pre-baked jar on disk?
find / -name "*iceberg*" -name "*.jar" 2>/dev/null
echo "search done, rc=$?"
