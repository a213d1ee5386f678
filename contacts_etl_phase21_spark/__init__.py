"""contacts_etl_phase21_spark — a PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``scranton/contacts-etl-phase21`` (see SURVEY.md):

- typed contact data model (``schemas``)
- scalar function library (``functions``): text/name/email/phone/address
  normalization, similarity, ids, timestamps
- source loaders (``sources``): LinkedIn CSV, Gmail CSV, vCard 3.0
- entity-resolution core (``operators``): blocking → pair scoring →
  connected components → survivorship
- four pipeline stages (``pipeline``): consolidate → validate →
  confidence → tag
- LLM-data-pipeline operators (``operators``): dedup (exact/MinHash-LSH/
  SimHash/n-gram Jaccard), similarity search, text analysis, multimodal
- the query inventory the driver verifies (``plans``)

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, and join planning; Python UDFs are Arrow-vectorized pandas UDFs
and only used where built-ins genuinely can't express the semantics.
"""

__version__ = "0.1.0"
