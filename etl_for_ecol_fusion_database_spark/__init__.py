"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference ETL pipeline
(kaionwong/etl-for-ecol-fusion-database), re-expressed Spark-first.

The reference is a single-driver pandas + PostgreSQL-SQL orchestrator; this
engine declares every computation as a lazy DataFrame / Spark SQL plan so
Catalyst + Tungsten handle pushdown, pruning, join strategy, partial
aggregation and shuffle planning — the things the reference either delegated
to PostgreSQL or did not do at all (SURVEY.md §4).

Layout
------
- ``session``     SparkSession factory + parity config pinning
- ``catalog``     table registry, PK metadata, schema reflection (S6-S8)
- ``schemas``     external-DB type mapping -> Spark StructType + DDL (S9)
- ``sources``     readers (S1-S5) and writers/sinks (S10-S16)
- ``operators``   relational + extension operators (SURVEY.md §2)
- ``functions``   scalar derivations (F1-F7)
- ``plans``       composed multi-operator pipelines (flagship §3.3)
- ``streaming``   Structured Streaming surface over the events table
"""

__version__ = "0.1.0"
