"""riskloc_spark — PySpark-native multi-dimensional root-cause localization
engine with the capabilities of shaido987/riskloc, plus large-scale
data-pipeline operators (dedup, similarity search, text analysis).

Reference: https://github.com/shaido987/riskloc (paper arXiv:2205.10004).
This is a from-scratch Spark-first re-expression, not a port: all per-leaf
work is declarative DataFrame algebra; driver code only orchestrates
layers/iterations over compact aggregated state.
"""

__version__ = "0.1.0"

from riskloc_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
