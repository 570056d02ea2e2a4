"""Spark operators: Arrow-UDF text stages + relational building blocks."""
