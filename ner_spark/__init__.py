"""ner_spark — a PySpark-native knowledge-graph-construction engine.

Re-expresses the semantics of the reference NER repo (zhenhua32/ner,
read-only at /root/reference) as an idiomatic Spark pipeline:

    transcripts (conv_id, turn_idx, role, text, tool, ts)
      → repartitionByRange(conv_id, turn_idx)
      → tag        (mapInPandas: vectorized forward + batched NumPy Viterbi)
      → extract    (pandas UDF: exact BIO/BIOES span extraction semantics)
      → relate     (open relation extraction over co-mentions, built-ins only)
      → link       (normalization + MinHash-LSH band self-join, built-ins only)
      → canonicalize (large-star/small-star connected components)
      → materialize nodes / edges / triples tables + per-partition manifest

Everything is DataFrame + vectorized pandas/Arrow UDFs — no per-row Python
on the hot path, no RDDs, no custom Catalyst rules.
"""

__version__ = "0.1.0"
