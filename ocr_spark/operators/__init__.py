"""Relational + training-data operators exposed by the engine.

Every operator here is declarative-first: built-in pyspark.sql.functions
(JVM-side, codegen-friendly) wherever semantics allow, Arrow-batched pandas
UDFs only where they don't (extraction kernels, minhash/simhash digests).
"""
