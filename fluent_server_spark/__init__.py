"""fluent_server_spark — a PySpark-native transcript log pipeline.

A brand-new batch analytics engine with the *capabilities* of
athoune/fluent-server (a fluentd Forward-protocol ingest head,
reference at /root/reference): parse -> enrich -> route (fan-out by
tag-style match) -> aggregate, re-expressed Spark-first over
Iceberg/parquet tables of multi-turn conversation transcripts.

Layout:
  data/       deterministic synthetic `turns` generator (pandas + Spark)
  functions/  vectorized scalar functions (grok parse, text analysis, vectors)
  operators/  relational/dataflow operators (enrich, route, aggregate,
              dedup, similarity, skew, multimodal)
  plans/      end-to-end pipeline + checkpoint/lineage/metrics (resume)
  streaming/  Structured Streaming variant of the pipeline
  oracle/     pure-pandas reference implementation (test oracle)
"""

__version__ = "0.1.0"
