"""mapreduce_inverted_index_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of ``lewiskyron/mapreduce-inverted-index``
(a Python/Flask MapReduce framework whose single job builds an inverted
index from web text), plus the relational and LLM-data-pipeline
operators a 100 TB training-data pipeline needs.

Design stance (SURVEY.md §7.1):
  * everything is a lazy DataFrame expression — Catalyst plans it,
    Tungsten executes it; there is no hand-rolled control plane,
  * builtin ``pyspark.sql.functions`` everywhere; Pandas UDFs only
    where the builtins genuinely cannot express the semantics
    (none in the core pipeline),
  * storage is partitioned Parquet, shuffles are Spark's own,
  * each public operator ships as a named query in
    ``plans.registry`` with a DuckDB oracle twin for differential
    testing.
"""

from mapreduce_inverted_index_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
