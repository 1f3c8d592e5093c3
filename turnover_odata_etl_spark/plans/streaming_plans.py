"""Structured Streaming queries (SURVEY §2.12 E14) — M4."""

from __future__ import annotations
