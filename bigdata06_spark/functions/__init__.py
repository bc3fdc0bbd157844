"""Scalar/expression helpers — pure Column-in/Column-out builders.

Everything here stays JVM-side (built-in `pyspark.sql.functions`
compositions inside whole-stage codegen); no Python UDFs.
"""
