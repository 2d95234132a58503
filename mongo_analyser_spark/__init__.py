"""mongo_analyser_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of habedi/mongo-analyser (reference:
/root/reference, studied structurally; no code copied).

The reference is a single-threaded, driver-side document analyzer
(mongo_analyser/core/analyser.py) — this package re-expresses its entire
surface (schema inference, per-field statistics, type-directed conversion,
export sinks, catalog metadata) as declarative Spark DataFrame plans, and
extends it with the relational / dedup / similarity / text / streaming
operators required for large-scale training-data pipelines.

Design stance (SURVEY.md §7.0):
  * DataFrame/Column expressions everywhere; zero row-at-a-time Python UDFs
    in the hot path; zero custom Catalyst rules.
  * One shuffle for the whole field-stats family (melt → groupBy(field)).
  * Every operator returns a DataFrame so Catalyst owns pushdown, pruning,
    join selection, and AQE owns runtime re-planning.
"""

from mongo_analyser_spark.config import ConfigManager
from mongo_analyser_spark.engine import Engine
from mongo_analyser_spark.session import get_spark

__all__ = ["ConfigManager", "Engine", "get_spark"]
__version__ = "0.2.0"
