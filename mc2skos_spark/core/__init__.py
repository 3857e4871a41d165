"""Pure-Python semantic core (no Spark imports allowed here).

Everything in this package operates on plain dicts/lists so it can be
unit-tested without a SparkSession and called from Arrow-batch UDFs.
"""
