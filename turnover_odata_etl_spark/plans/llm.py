"""LLM-data-pipeline queries (SURVEY §2.12 E8–E11) — M4."""

from __future__ import annotations
