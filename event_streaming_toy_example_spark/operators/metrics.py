"""Pipeline metrics (SURVEY.md §2.3 A2/A3/A4, §2.6 K4).

The reference mutates a counters dataclass from inside the pipeline and
appends a Markdown report (``mock_cloudwatch.py``). Here metrics ride
the query itself via ``df.observe`` (no extra job, no extra scan) plus a
driver-side dataclass and Markdown renderer. Fixed by design:
- div-by-zero in the error ratio (reference ``mock_cloudwatch.py:21-24``,
  SURVEY.md §8.8) is guarded;
- storage gauges are point-in-time, not ``+=``-accumulated
  (reference quirk SURVEY.md §8.7).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, functions as F


@dataclass
class PipelineMetrics:
    """Mirror of the reference's 10-field metrics surface
    (``mock_cloudwatch.py:8-19``)."""

    lambda_invocations: int = 0
    ingested_events: int = 0
    duplicates_prevented: int = 0
    batch_duplicates: int = 0
    glue_invocations: int = 0
    used_staging_storage_in_mbytes: float = 0.0
    used_processed_storage_in_mbytes: float = 0.0
    total_storage_limit_in_mbytes: float = 2048.0
    ingestion_error_ratio: float = field(default=0.0)
    used_storage_percentage: float = field(default=0.0)

    def finalize(self) -> "PipelineMetrics":
        """A3: derived ratios, div-by-zero-safe."""
        total_seen = self.ingested_events + self.duplicates_prevented
        self.ingestion_error_ratio = (
            self.duplicates_prevented / total_seen if total_seen else 0.0
        )
        self.used_storage_percentage = (
            (self.used_staging_storage_in_mbytes + self.used_processed_storage_in_mbytes)
            / self.total_storage_limit_in_mbytes
            * 100.0
        )
        return self


def observe_ingest(df: DataFrame, name: str = "ingest") -> tuple[DataFrame, Observation]:
    """A2: attach row/distinct-ish counters to a query without a second
    scan. Read ``observation.get`` after an action on the returned df."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs


def dir_size_mbytes(path: str) -> float:
    """A4: point-in-time recursive size of a local/posix directory in MB
    (2 dp, like the reference's gauge). On a real deployment this is a
    FileSystem.getContentSummary call, not a query."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            fp = os.path.join(root, f)
            try:
                total += os.path.getsize(fp)
            except OSError:
                pass
    return round(total / (1024 * 1024), 2)


def render_markdown_report(m: PipelineMetrics) -> str:
    """K4: Markdown report body (one ``## field`` block per metric,
    matching the reference's report shape, ``mock_cloudwatch.py:38-54``)."""
    m.finalize()
    lines = ["# Pipeline metrics report", ""]
    for fname in (
        "lambda_invocations",
        "ingested_events",
        "duplicates_prevented",
        "batch_duplicates",
        "glue_invocations",
        "used_staging_storage_in_mbytes",
        "used_processed_storage_in_mbytes",
        "total_storage_limit_in_mbytes",
        "ingestion_error_ratio",
        "used_storage_percentage",
    ):
        title = fname.replace("_", " ").capitalize()
        lines += [f"## {title}", f"Value: {getattr(m, fname)}", ""]
    return "\n".join(lines)


def append_markdown_report(m: PipelineMetrics, path: str) -> None:
    """K4: append-mode report sink (the reference appends every cycle)."""
    with open(path, "a", encoding="utf-8") as fh:
        fh.write(render_markdown_report(m) + "\n")
