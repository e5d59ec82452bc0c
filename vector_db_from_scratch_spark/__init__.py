"""PySpark-native analytics engine with the query surface of
``ipulkitg/vector-db-from-scratch`` (see SURVEY.md), re-expressed Spark-first.

Layout:
    functions/  -- column-expression library (vector math, hashing, text)
    sources/    -- table loaders for the driver's parquet testdata
    operators/  -- query operators (knn, lsh, ivf, dedup, relational, text)
    streaming/  -- Structured Streaming analogs (windows, watermark, state)
    plans/      -- plan inspection helpers (explain capture, shuffle audit)
"""

__version__ = "0.1.0"
