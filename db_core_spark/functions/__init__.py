"""Reusable JVM-side kernels (text shingles/minhash/simhash, vector math).
All built on pyspark.sql.functions higher-order functions — no Python UDFs in
the hot path."""
