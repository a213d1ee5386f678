"""Scalar function library (SURVEY.md §2.3).

Pure-Python cores live beside Spark wrappers:

- the cores are importable by unit tests and by Arrow-batched pandas
  UDFs (the only Python that runs on executors);
- everything expressible as built-in column expressions also ships a
  Column builder so the hot path stays inside whole-stage codegen.
"""

from contacts_etl_phase21_spark.functions.text import fold_text  # noqa: F401
from contacts_etl_phase21_spark.functions.similarity import seq_ratio  # noqa: F401


def register_sql_functions(spark) -> None:
    """Expose the scalar library to spark.sql (SURVEY.md §4 nicety):

        SELECT seq_ratio(a, b), fold_text(name), nickname_root(n) ...

    Registers the Arrow pandas UDFs under their reference names so the
    whole surface is queryable without the DataFrame API."""
    from contacts_etl_phase21_spark.functions.spark_cols import (
        udf_fold_text, udf_nickname_root, udf_parse_full_name,
        udf_seq_ratio,
    )

    spark.udf.register("seq_ratio", udf_seq_ratio)
    spark.udf.register("fold_text", udf_fold_text)
    spark.udf.register("nickname_root", udf_nickname_root)
    spark.udf.register("parse_full_name", udf_parse_full_name)
