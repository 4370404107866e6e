"""kerf_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kevinlawler/kerf (columnar tick-series
DBMS + APL-family vector language), re-expressed Spark-first.

Layout:
    session    — SparkSession bootstrap (ns-timestamps, AQE, Arrow)
    functions  — scalar/temporal/null-semantics Column library
    operators  — relational verbs, window adverbs, as-of/interval joins,
                 dedup, similarity search, text analysis, multimodal
    sources    — parquet/CSV/JSON IO + the workspace catalog
    plans      — kerf-SQL text front-end
    streaming  — Structured Streaming ingestion (feed-handler surface)
"""

from .session import get_spark, configure

__all__ = ["get_spark", "configure"]
__version__ = "0.1.0"
