"""boxoffice_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference box-office platform (yu901/BoxOffice, surveyed in SURVEY.md),
re-expressed Spark-first: DataFrame/SQL logical plans optimized by Catalyst,
AQE for runtime re-planning, Pandas UDFs only where built-ins cannot express
the semantics, Structured Streaming for the incremental feeds.

Layout
------
- ``session``    SparkSession factory tuned for the target workload
- ``tables``     fixture/table loading + temp-view registration
- ``registry``   query registry backing ``__spark_entry__.queries()``
- ``functions``  scalar expression library (cleaning, datetime, json, numeric)
- ``operators``  composite operators (upsert, fuzzy join, dedup, similarity, text)
- ``queries``    registered query definitions, one module per operator family
- ``streaming``  Structured Streaming jobs (micro-batch poll semantics)
"""

__version__ = "0.1.0"
