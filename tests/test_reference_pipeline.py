"""End-to-end test of the C1 orchestration: rate source -> streaming
ingest -> compaction -> metrics report, bounded to a few seconds."""

from __future__ import annotations

import os

from event_streaming_toy_example_spark.plans.pipeline import (
    run_reference_pipeline,
)


def test_run_reference_pipeline(spark, tmp_path):
    m = run_reference_pipeline(
        spark,
        str(tmp_path),
        run_seconds=6.0,
        rows_per_second=100,
        trigger_seconds=None,  # as-fast-as-possible micro-batches
    )
    assert m.ingested_events > 0
    assert m.glue_invocations == 1
    # compaction saw every staged row and produced a clean parquet set
    from event_streaming_toy_example_spark.plans.pipeline import read_processed

    processed = read_processed(spark, str(tmp_path / "processed"))
    assert processed.count() == m.ingested_events - m.batch_duplicates
    assert os.path.exists(tmp_path / "cloudwatch_report.md")
    text = (tmp_path / "cloudwatch_report.md").read_text()
    assert "Ingested Events" in text or "ingested" in text.lower()
