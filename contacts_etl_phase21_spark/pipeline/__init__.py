"""The four reference pipeline stages as DataFrame programs.

consolidate → validate → confidence → tag, exchanging typed DataFrames
(Parquet at rest) instead of the reference's CSV files
(Makefile:55 `pipeline:` chain).
"""

from contacts_etl_phase21_spark.pipeline.config import (
    PipelineConfig, QualityWeights, TaggingSettings, load_config,
)
from contacts_etl_phase21_spark.pipeline.confidence import (
    confidence_report, confidence_summary,
)
from contacts_etl_phase21_spark.pipeline.consolidate import (
    ConsolidateResult, assert_unique_contact_ids, consolidate_records,
    duplicate_contact_ids, flatten_contacts,
)
from contacts_etl_phase21_spark.pipeline.tag import (
    notes_blob, referral_targets, tag_contacts,
)
from contacts_etl_phase21_spark.pipeline.validate import (
    validation_report, validation_summary,
)

__all__ = [
    "PipelineConfig", "QualityWeights", "TaggingSettings", "load_config",
    "ConsolidateResult", "consolidate_records", "flatten_contacts",
    "duplicate_contact_ids", "assert_unique_contact_ids",
    "validation_report", "validation_summary",
    "confidence_report", "confidence_summary",
    "notes_blob", "tag_contacts", "referral_targets",
]
