"""graphiti_spark — a PySpark-native episodic knowledge-graph construction engine.

A from-scratch reimplementation of the capabilities of ourines/graphiti
(reference at /root/reference, graphiti-core v0.21.0pre10) as a batch
pipeline over partitioned tables of Common-Crawl-style web pages:

    web_pages (url, warc_ts, html, text, lang)
      -> episodes                  (S3)
      -> entity mentions           (E1, vectorized pandas UDF)
      -> (subj, pred, obj) triples (E3, vectorized pandas UDF)
      -> entity dedup/canonicalize (D1-D14: exact key + MinHash-LSH + CC)
      -> edge dedup + temporal invalidation (T1-T7)
      -> materialized nodes/edges/mentions tables with lineage manifests

Operator ids (S*, E*, D*, T*, G*, Q*, U*) refer to SURVEY.md §2.
"""

__version__ = "0.1.0"

from graphiti_spark.session import get_spark  # noqa: F401


def __getattr__(name):
    # lazy: importing the package must not pull the full pipeline stack
    if name == "GraphitiSpark":
        from graphiti_spark.graphiti import GraphitiSpark

        return GraphitiSpark
    raise AttributeError(name)
