"""projectdatalake_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference data-lake ETL (dysartcoal/ProjectDataLake,
surveyed in /root/repo/SURVEY.md), generalized into a reusable engine:

- ``session``    — SparkSession factory + runtime tuning (reference etl.py:19-25)
- ``schemas``    — explicit StructTypes for all sources (replaces schema inference)
- ``sources``    — readers/writers: JSON & Parquet scans, partitioned overwrite
                   sinks (reference etl.py:43, 49-52, 64-66, ...)
- ``operators``  — relational core (project/filter/join/dedup), aggregates,
                   windows, as-of joins, large-scale dedup (MinHash-LSH, SimHash),
                   similarity search, text analysis, multimodal plumbing
- ``functions``  — scalar/array expression surface (all Catalyst built-ins)
- ``pipelines``  — the star-schema ETL pipeline, generalized
- ``streaming``  — Structured Streaming variants of the event pipeline
- ``plans``      — plan introspection helpers (pushdown/broadcast assertions)

Everything is DataFrame/SQL + Catalyst; no RDDs. Python UDFs appear only as
Arrow-vectorized pandas UDFs where built-ins cannot express the semantics
(multimodal decode stubs). Designed for 100 TB scale: declarative plans,
broadcast-able dims, partition discipline, no driver-side collects.
"""

__version__ = "0.1.0"

from projectdatalake_spark.session import get_spark, prepare  # noqa: F401
