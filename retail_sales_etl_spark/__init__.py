"""retail_sales_etl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference retail-sales ETL
(pandas -> SQLite; see /root/reference) Spark-first: declarative
DataFrame/SQL plans optimized by Catalyst, broadcast star joins,
decimal-exact money math, and large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
