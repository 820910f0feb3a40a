"""Utilities: image IO, timing helpers."""
