"""Operator library: CDC apply, dedup, similarity, text, relational, multimodal."""
