"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal plumbing — the operations a 100 TB
training-data pipeline layers on top of the KG extraction engine.

Everything here is built from JVM-side ``pyspark.sql.functions``
(higher-order array functions, no Python in the hot path) unless a
kernel genuinely needs NumPy, in which case it is an Arrow-batched
pandas UDF.
"""
