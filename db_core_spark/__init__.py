"""db_core_spark — a PySpark-native analytics engine with the data-processing
capabilities of the reference storage engine (stencillogic/db-core), re-expressed
Spark-first.

Layers:
- ``session``   — SparkSession factory tuned for local[32] testing, cluster-ready.
- ``tables``    — fixture table catalog (TPC-H-ish star schema + events/documents/embeddings).
- ``registry``  — query registry mapping operator names to (spark_fn, oracle_sql).
- ``queries``   — the relational / streaming-batch / LLM operator surface (SURVEY.md §2B).
- ``plans``     — the versioned-table layer: commit-log manifests, MVCC snapshot reads,
  tombstone deletes, vacuum (mirrors reference src/system/instance.rs + block_driver.rs).
- ``streaming`` — Structured Streaming operators (watermarks, windows, dedup).
- ``functions`` — text/vector kernels (minhash, simhash, cosine) built on pyspark.sql.functions.
- ``operators`` — composite operators Spark lacks natively (as-of join, range join, top-k).
"""

__version__ = "0.1.0"
