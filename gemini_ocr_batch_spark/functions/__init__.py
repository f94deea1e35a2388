"""Scalar-function helpers shared across operators.

Everything here composes built-in ``pyspark.sql.functions`` (JVM-side,
codegen'd) — the F1-F15 scalar surface of SURVEY.md §2.8.
"""
