"""pdf_metadata_extraction_spark — a from-scratch PySpark-native
knowledge-graph-construction engine with the query and data-processing
capabilities of huridocs/pdf_metadata_extraction (reference studied at
/root/reference, re-expressed Spark-first; NOT a port).

Layout
------
- ``session``     SparkSession factory (AQE, Arrow, shuffle sizing).
- ``schemas``     every table schema (pages, tokens, segments, labels,
                  options, triples, lineage).
- ``sources``     synthetic ``pages`` generator + reference-derived
                  fixture documents + IO helpers.
- ``operators``   the dataflow operators from SURVEY.md §2 as
                  DataFrame/Arrow-UDF stages.
- ``plans``       the end-to-end pipelines (train / predict / align),
                  lineage + checkpoint conventions.
- ``streaming``   optional Structured-Streaming task feed (the
                  reference's Redis queue analogue).
"""

__version__ = "0.1.0"
