"""Typed pipeline configuration (reference config_loader.py:64-165).

A plain dataclass tree — the engine is a DataFrame program, so config
stays driver-side and needs no Spark machinery. YAML loading is optional
(PyYAML ships with pyspark); every knob has the reference's default.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from contacts_etl_phase21_spark.functions.merge_core import DedupeConfig
from contacts_etl_phase21_spark.functions.record_norm import NormSettings


@dataclass(frozen=True)
class QualityWeights:
    """validate_quality.py:118-122 defaults (config.yaml quality:)."""

    email_full_score: int = 40
    email_partial_score: int = 20
    phone_full_score: int = 30
    phone_partial_score: int = 15
    address_any_score: int = 30


# reference tag_contacts.py:19-31 — the fallback when config omits
# tagging.local_cities
DEFAULT_LOCAL_CITIES = (
    "braintree", "quincy", "weymouth", "dedham", "milton", "hingham",
    "needham", "brookline", "cambridge", "somerville", "boston",
)


@dataclass(frozen=True)
class TaggingSettings:
    """tagging.py:31-44 (config.yaml tagging:)."""

    prior_companies: tuple[str, ...] = ()
    prior_domains: tuple[str, ...] = ()
    local_cities: tuple[str, ...] = DEFAULT_LOCAL_CITIES

    def normalized_companies(self) -> list[str]:
        return [c.strip().lower() for c in self.prior_companies]

    def normalized_domains(self) -> list[str]:
        return [d.strip().lower() for d in self.prior_domains]

    def normalized_cities(self) -> list[str]:
        return [c.strip().lower() for c in self.local_cities]


@dataclass(frozen=True)
class PipelineConfig:
    normalization: NormSettings = field(default_factory=NormSettings)
    dedupe: DedupeConfig = field(default_factory=DedupeConfig)
    quality: QualityWeights = field(default_factory=QualityWeights)
    tagging: TaggingSettings = field(default_factory=TaggingSettings)
    log_level: str = ""  # config.yaml logging.level; "" -> default


def resolve_log_level(config: "PipelineConfig",
                      override: str | None = None) -> int:
    """Effective NUMERIC log level with the reference's precedence
    (logging_utils.py:22-39): env CONTACTS_ETL_LOG_LEVEL > caller
    override (CLI flag) > config.yaml logging.level > WARNING — and the
    reference's name resolution (logging_utils.py:10-19): digit strings
    are numeric levels, unknown names fall back to logging.INFO."""
    import logging
    import os

    name = str(os.getenv("CONTACTS_ETL_LOG_LEVEL") or override
               or config.log_level or "WARNING").upper()
    if name.isdigit():
        return int(name)
    return getattr(logging, name, logging.INFO)


def load_config(path: str | None = None) -> PipelineConfig:
    """YAML file → PipelineConfig; missing path → all defaults."""
    if not path:
        return PipelineConfig()
    import yaml

    with open(path, encoding="utf-8") as fh:
        raw = yaml.safe_load(fh) or {}
    norm = raw.get("normalization", {}) or {}
    logging_cfg = raw.get("logging", {}) or {}
    dedupe = raw.get("dedupe", {}) or {}
    quality = raw.get("quality", {}) or {}
    tagging = raw.get("tagging", {}) or {}
    def _token_set(key: str, default: frozenset[str]) -> frozenset[str]:
        """YAML list → squashed-lowercase token set; absent key keeps the
        engine default (≡ the reference's shipped config.yaml lists)."""
        values = norm.get(key)
        if values is None:
            return default
        from contacts_etl_phase21_spark.functions.names import squash_token

        return frozenset(squash_token(v) for v in values if squash_token(v))

    return PipelineConfig(
        normalization=NormSettings(
            default_phone_country=norm.get("default_phone_country", "US"),
            drop_invalid_emails=bool(norm.get("drop_invalid_emails", False)),
            drop_invalid_phones=bool(norm.get("drop_invalid_phones", False)),
            email_dns_mx_check=bool(norm.get("email_dns_mx_check", False)),
            generational_suffixes=_token_set(
                "keep_generational_suffixes",
                NormSettings.generational_suffixes),
            professional_suffixes=_token_set(
                "professional_suffixes", NormSettings.professional_suffixes),
            name_prefixes=_token_set(
                "name_prefixes", NormSettings.name_prefixes)),
        dedupe=DedupeConfig(
            merge_score_threshold=float(
                dedupe.get("merge_score_threshold", 1.2)),
            relaxed_merge_threshold=float(
                dedupe.get("relaxed_merge_threshold", 0.6)),
            first_name_similarity_threshold=float(
                dedupe.get("first_name_similarity_threshold", 0.88)),
            nickname_equivalence=bool(
                dedupe.get("nickname_equivalence", True)),
            require_corroborator=bool(
                dedupe.get("require_corroborator", False)),
            default_phone_country=norm.get("default_phone_country", "US")),
        quality=QualityWeights(
            email_full_score=int(quality.get("email_full_score", 40)),
            email_partial_score=int(quality.get("email_partial_score", 20)),
            phone_full_score=int(quality.get("phone_full_score", 30)),
            phone_partial_score=int(quality.get("phone_partial_score", 15)),
            address_any_score=int(quality.get("address_any_score", 30))),
        tagging=TaggingSettings(
            prior_companies=tuple(tagging.get("prior_companies", []) or []),
            prior_domains=tuple(tagging.get("prior_domains", []) or []),
            # empty/absent list falls back like the reference
            # (tag_contacts.py:130: `... or DEFAULT_LOCAL_CITIES`)
            local_cities=tuple(tagging.get("local_cities", [])
                               or DEFAULT_LOCAL_CITIES)),
        log_level=str(logging_cfg.get("level", "") or ""),
    )
