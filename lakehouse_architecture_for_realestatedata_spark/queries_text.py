"""Text-analysis / dedup / similarity queries (extension scope) — registered
into the shared registry. Filled by the training-data-pipeline operators."""

from __future__ import annotations
