"""Registry wave 4: EXT analytics — dedup, similarity search, text
analysis, multimodal (SURVEY.md section 2.7 + driver north star)."""

from __future__ import annotations
