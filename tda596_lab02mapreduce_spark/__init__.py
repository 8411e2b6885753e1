"""PySpark-native analytics engine with the capability surface of the
reference MapReduce engine (yifanz01/TDA596-Lab02MapReduce) rebuilt
Spark-first, plus LLM-data-pipeline extension operators.

Layout (SURVEY.md §7):
- ``session``     SparkSession factory (AQE on, UTC, sane local defaults)
- ``io``          fixture table loaders / temp-view registration
- ``registry``    named-query registry backing ``__spark_entry__.py``
- ``operators``   MR façade, dedup, similarity, as-of join, text analysis
- ``functions``   reusable column expressions (tokenizer, vector math)
- ``sources``     reader/writer helpers for text/csv/json/parquet
- ``plans``       plan-inspection helpers (broadcast/pushdown assertions)
- ``streaming``   Structured Streaming windows/watermark operators
- ``queries``     the oracle-checked query inventory (SURVEY.md §2)
"""

__version__ = "0.1.0"
