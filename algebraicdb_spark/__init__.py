"""algebraicdb_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query semantics of the
``algebraicdb/algebraicdb`` reference (SQL core + algebraic data
types / pattern matching), extended with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
columns), designed Spark-first: declarative DataFrame/SQL plans that
Catalyst + Tungsten optimize, with Pandas UDFs only where built-ins
cannot express the semantics.

Layout:
    sources/    table registry, readers/writers (parquet/csv/json)
    operators/  relational operators (joins, aggs, windows, set ops,
                dedup, similarity)
    functions/  scalar-function surface + the ADT expression builder
    plans/      the query/oracle registry that __spark_entry__ exposes
    streaming/  Structured Streaming variants of the stream operators
"""

from algebraicdb_spark.engine import Engine
from algebraicdb_spark.functions.adt import AdtType, Variant
from algebraicdb_spark.session import get_spark
from algebraicdb_spark.sources.catalog import load_tables

__all__ = ["Engine", "AdtType", "Variant", "get_spark", "load_tables"]
__version__ = "0.1.0"
