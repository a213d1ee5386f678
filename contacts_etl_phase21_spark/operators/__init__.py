"""Distributed operators: entity resolution core + LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal)."""
