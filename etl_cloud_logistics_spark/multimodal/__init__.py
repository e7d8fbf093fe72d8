"""Multimodal column support (north-star extension X5)."""
