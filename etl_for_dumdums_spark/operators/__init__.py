"""Reusable large-scale operators: dedup, similarity, text, multimodal, enrichment."""
