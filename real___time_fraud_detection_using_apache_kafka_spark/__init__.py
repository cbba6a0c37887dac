"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference fraud-detection pipeline
(``thushaniNiwarthana/Real---Time-Fraud-Detection-using-Apache-Kafka``),
re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local testing / cluster scale
- ``schemas``    : explicit schema contracts (the reference's were implicit)
- ``sources``    : table loaders, synthetic txn generator, log scan/parse
- ``functions``  : scalar expression library (SURVEY.md §2.8)
- ``operators``  : relational / aggregate / window / dedup / similarity / text ops
- ``plans``      : named query registry with DuckDB oracle SQL per query
- ``streaming``  : Structured Streaming pipelines (SURVEY.md §2.10)
- ``ml``         : MLlib train/score pipeline + metric battery (SURVEY.md §2.9)
"""

__version__ = "0.1.0"
