"""earthquake_data_pipeline_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ELT pipeline (eddie-mar/Earthquake-Data-Pipeline) as an idiomatic Spark
engine: declarative DataFrame plans, Catalyst-optimized, designed for
100 TB scale (broadcast dims, keyed shuffles only where semantics demand,
partition pruning, no driver-side row loops).

Layout:
- ``session``    — tuned SparkSession factory
- ``schemas``    — canonical explicit StructTypes per layer (SURVEY.md §1.3)
- ``functions``  — Column-expression helpers (SURVEY.md §2.3: D1-D15)
- ``operators``  — cleaning / dedup / merge / enrichment / text / similarity
- ``sources``    — ingestion (paged-HTTP Python DataSource, IO helpers)
- ``plans``      — model registry: stg → fact → 9 analytics models (§3.3)
- ``streaming``  — Structured Streaming faces of the incremental routines (§2.9)
"""

__version__ = "0.1.0"
