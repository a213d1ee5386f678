"""Distributed record normalization (SURVEY.md §2.5 N1-N5).

mapInPandas over the typed contact DataFrame: each Arrow batch runs the
pure cascade in functions/record_norm.py. No shuffle — normalization is
embarrassingly parallel per input partition, so at 100 TB this stage
scales linearly with executors and stays entirely out of the driver.

Parity target: _normalize_records (reference combine_contacts.py:1107-1113).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from contacts_etl_phase21_spark.functions.record_norm import (
    NormSettings, normalize_record,
)
from contacts_etl_phase21_spark.schemas import CONTACT_SCHEMA

# StructType.add mutates in place — build a fresh StructType instead.
NORMALIZED_SCHEMA = StructType(
    list(CONTACT_SCHEMA.fields)
    + [StructField("invalid_emails", ArrayType(StringType()), True),
       StructField("non_standard_phones", ArrayType(StringType()), True)])

_FIELDS = [f.name for f in NORMALIZED_SCHEMA.fields]
_CHANNELS = ("emails", "phones", "addresses")


def _row_to_record(row: dict) -> dict:
    """Arrow gives array<struct> columns as numpy arrays of dicts; the
    pure core wants plain lists (and '' for missing scalars)."""
    rec = {}
    for key, value in row.items():
        if key in _CHANNELS:
            rec[key] = [dict(x) for x in value] if value is not None else []
        else:
            rec[key] = value if value is not None else ""
    return rec


def normalize_records(df: DataFrame,
                      settings: NormSettings = NormSettings()) -> DataFrame:
    """CONTACT_SCHEMA in → CONTACT_SCHEMA + invalid/non-standard lists out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                rec = normalize_record(_row_to_record(row), settings)
                out.append(tuple(rec.get(f) for f in _FIELDS))
            yield pd.DataFrame(out, columns=_FIELDS)

    return df.mapInPandas(run, NORMALIZED_SCHEMA)
