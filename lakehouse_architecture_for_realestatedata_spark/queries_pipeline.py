"""Medallion-pipeline parity queries (merge / incremental / SCD2) — registered
into the shared registry."""

from __future__ import annotations
