"""database_replicator_spark — a PySpark-native analytics/replication engine.

Re-expresses the query and data-processing capabilities of the reference
``serenorg/database-replicator`` (a Rust ETL/replication CLI) on top of
Apache Spark DataFrames, and extends them with large-scale
training-data-pipeline operators (dedup, similarity search, text analysis).

Design stance (SURVEY.md §7):
  * DataFrame / Spark SQL everywhere; no RDDs.
  * Catalyst does pushdown/pruning/join-selection; we declare plans.
  * Python UDFs only where built-ins genuinely cannot express semantics
    (and then Arrow-batched Pandas UDFs, never row-at-a-time).
  * Every operator is designed for a 1000-executor / 100 TB deployment even
    though tests run on local[32] against small scale factors.
"""

__version__ = "0.1.0"
