"""Relational + scale operators (merge/upsert, dedup, similarity, multimodal)."""
