"""a_share_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``ellendan000/a-share-data-pipeline`` (reference at /root/reference/, a
pandas+Prefect ETL that assembles a canonical wide table of A-share daily
market data) as an idiomatic Apache Spark engine:

- declarative DataFrame / Spark SQL plans (Catalyst optimizes; no hand
  scheduling),
- explicit schemas everywhere (reference infers; see SURVEY.md §1.2),
- Parquet-first storage partitioned by date (reference appends CSV),
- watermark-driven incremental batch + Structured Streaming variants of
  the reference's hand-rolled delta loop
  (reference: market/delta_non_fq_daily_kline.py:63-108),
- an analytics surface (agg / window / join / set ops) and LLM-data
  operators (dedup, similarity search, text analysis, multimodal
  plumbing) designed for 100 TB scale.
"""

__version__ = "0.1.0"
