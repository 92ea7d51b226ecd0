"""Named DataFrame -> DataFrame operators (SURVEY.md §2 inventory).

Each module exposes composable functions over DataFrames; every operator
that the driver's correctness gate covers is registered in
``__spark_entry__.queries()`` with a DuckDB ``oracle_sql()`` twin.
"""
