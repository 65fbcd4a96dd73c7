"""Incremental file discovery (S6) — manifest-based exactly-once ingest.

The reference tracks processed input files in a ``_processed_files.txt``
object and ingests the set difference on every run
(reference: scripts/load_bronze_to_table.py:37-73,80-87), then re-filters rows
by ``~input_file_name().isin(processed)`` as a belt-and-braces guard
(reference: scripts/load_bronze_to_table.py:136-137).

This module keeps those exact batch semantics (the streaming-native upgrade —
file source + Trigger.AvailableNow checkpoint — lives in
``streaming.ingest``). Scale notes: the manifest diff is pure driver-side
metadata (file *names*, not data), so it stays O(#files); the data-plane scan
only ever lists the new files, so a 100 TB table with 1 TB of new files scans
1 TB.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ManifestIngest:
    """Exactly-once batch ingest of files under ``source_glob`` into a sink."""

    def __init__(self, spark: SparkSession, manifest_path: str):
        self.spark = spark
        self.manifest_path = manifest_path

    def processed(self) -> set[str]:
        try:
            with open(self.manifest_path) as fh:
                return {line.strip() for line in fh if line.strip()}
        except FileNotFoundError:
            return set()

    def _record(self, files: list[str]) -> None:
        os.makedirs(os.path.dirname(self.manifest_path) or ".", exist_ok=True)
        with open(self.manifest_path, "a") as fh:
            for f in files:
                fh.write(f + "\n")

    def new_files(self, all_files: list[str]) -> list[str]:
        done = self.processed()
        return sorted(f for f in all_files if f not in done)

    def ingest(
        self,
        all_files: list[str],
        reader: Callable[[list[str]], DataFrame],
        sink: Callable[[DataFrame], None],
    ) -> int:
        """Read only unseen files, double-guard rows by provenance filter
        (P3: ``~col('_input_file').isin(processed)``), write, then mark
        processed. Returns the number of files ingested."""
        todo = self.new_files(all_files)
        if not todo:
            return 0
        df = reader(todo)
        if "_input_file" in df.columns:
            # ``_metadata.file_path`` is a URI (file:///…); the manifest holds
            # plain paths — match both spellings or the guard silently becomes
            # a no-op (caught by tests/test_ingest_spine.py).
            done: list[str] = []
            for p in self.processed():
                ap = os.path.abspath(p)
                done += [ap, "file://" + ap, "file:" + ap]
            if done:
                # Negated membership filter on provenance (P3). The processed
                # set is driver-side metadata; Catalyst turns isin on a
                # bounded list into an In predicate, no shuffle.
                df = df.filter(~F.col("_input_file").isin(done))
        sink(df)
        self._record(todo)
        return len(todo)
