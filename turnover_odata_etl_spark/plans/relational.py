"""Relational extension queries (SURVEY §2.12 E1–E7, E13) — M3."""

from __future__ import annotations
