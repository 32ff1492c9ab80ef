"""Operators: enrichment, deduplication, metrics, physical layout."""

from event_streaming_toy_example_spark.operators.enrich import (  # noqa: F401
    enrich_events,
    split_event_name,
    with_created_datetime,
    with_language_id,
)
from event_streaming_toy_example_spark.operators.dedup import (  # noqa: F401
    count_duplicate_keys,
    dedup_exact,
    dedup_keep_first,
)
from event_streaming_toy_example_spark.operators.metrics import (  # noqa: F401
    PipelineMetrics,
    observe_ingest,
    render_markdown_report,
)
from event_streaming_toy_example_spark.operators.partitioning import (  # noqa: F401
    write_processed_parquet,
)
