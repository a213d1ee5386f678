"""Scalar function library (SURVEY.md §2.3).

Pure-Python cores live beside Spark wrappers:

- the cores are importable by unit tests and by Arrow-batched pandas
  UDFs (the only Python that runs on executors);
- everything expressible as built-in column expressions also ships a
  Column builder so the hot path stays inside whole-stage codegen.
"""

from contacts_etl_phase21_spark.functions.text import fold_text  # noqa: F401
from contacts_etl_phase21_spark.functions.similarity import seq_ratio  # noqa: F401
