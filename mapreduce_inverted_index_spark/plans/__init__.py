"""Query plans: the named-query registry the driver contract consumes.

This is the engine's analog of the reference's ``FunctionRegistry``
(``mapper/src/available_functions.py:5-25``, ``master/src/map_functions.py:2-9``):
a catalog mapping operator names to executable definitions — except the
"contract" here is a machine-checked DuckDB oracle, not prose.
"""

from mapreduce_inverted_index_spark.plans.registry import (
    Query,
    all_queries,
    register,
)

__all__ = ["Query", "register", "all_queries"]
