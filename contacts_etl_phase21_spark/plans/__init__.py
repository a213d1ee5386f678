"""Query inventory: every operator from SURVEY.md §2 declared as a named
query over the driver's synthetic tables, each with a DuckDB oracle twin
where SQL-expressible."""

from contacts_etl_phase21_spark.plans.registry import QUERIES, Query, query  # noqa: F401

# Importing the modules populates the registry.
from contacts_etl_phase21_spark.plans import relational  # noqa: F401,E402
from contacts_etl_phase21_spark.plans import functions_queries  # noqa: F401,E402
from contacts_etl_phase21_spark.plans import llm_ops  # noqa: F401,E402
from contacts_etl_phase21_spark.plans import er_queries  # noqa: F401,E402
from contacts_etl_phase21_spark.plans import streaming_queries  # noqa: F401,E402
from contacts_etl_phase21_spark.plans import coverage_queries  # noqa: F401,E402
