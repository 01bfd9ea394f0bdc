"""Pipeline registry — name → builder (reference: scripts/main.py:284-297)."""

from __future__ import annotations
