"""PySpark-native analytics engine with the data-processing capabilities of
Nayarah/pipeline-etl-ecommerce (a PHP/MySQL e-commerce ETL system), rebuilt
Spark-first.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, broadcast, tz).
- ``schemas``    : explicit StructTypes for every table in the reference's
                   star schema (SURVEY.md §1.2) plus nested ingestion payloads.
- ``sources``    : readers (parquet/json/jdbc) and keyed sinks (upsert/MERGE,
                   insert-if-absent, overwrite — SURVEY.md §2.1 S9-S14).
- ``operators``  : reusable engine operators — proportional allocation
                   (the reference's semantic core, SURVEY.md §2.5 W1-W3/W6),
                   ranking/top-k, dedup (exact/MinHash-LSH/SimHash), similarity
                   search (incl. pinned-arithmetic IVF), clustering/SemDeDup,
                   text analysis, deterministic + weighted sampling, model
                   scoring (Arrow batch inference), chunking/packing, skew
                   salting, profiling, OLAP/stats/timeseries surfaces.
- ``functions``  : scalar expression helpers (dates/tz, locale numeric parse,
                   nested-JSON SKU extraction via higher-order functions).
- ``plans``      : one module per reference pipeline, each a pure
                   DataFrame-in/DataFrame-out transform (SURVEY.md §3).
- ``streaming``  : incremental/queue semantics as Structured Streaming or
                   watermark-driven batch (SURVEY.md §2.10).

Everything is built on the public PySpark DataFrame/SQL API; no Python UDFs
are needed for reference parity (SURVEY.md §2.11) — hot paths stay JVM-side
inside whole-stage codegen.
"""

__version__ = "0.1.0"
