"""redshells_spark — a PySpark-native analytics/ML-pipeline engine.

A from-scratch, Spark-first re-expression of the capabilities of
m3dev/redshells (Luigi/Gokart ML-pipeline task library): dataframe
utility operators, text/TF-IDF/embedding pipelines, similarity
computation, recommender training — plus large-scale training-data
pipeline operators (dedup, ANN similarity search, text analysis,
multimodal columns) designed for 100 TB-scale execution.

Everything is declared through the DataFrame API so Catalyst handles
pushdown, pruning, join selection, partial aggregation and AQE; Python
only runs inside Arrow-batched pandas UDFs at model boundaries.
"""

from redshells_spark.session import get_spark_session, stop_spark_session

__version__ = "0.1.0"

__all__ = ["get_spark_session", "stop_spark_session", "__version__"]
