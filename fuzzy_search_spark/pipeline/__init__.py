"""Web-scale training-data pipeline operators (DataFrame-native).

Everything here is expressed with built-in pyspark.sql functions (JVM-side,
whole-stage codegen) — no Python UDFs — so plans scale with Catalyst's
normal machinery: partial aggregation, broadcast joins, AQE skew handling.
"""
