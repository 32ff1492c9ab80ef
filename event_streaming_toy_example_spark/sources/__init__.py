"""Sources: synthetic event generation, Kinesis envelope codec, NDJSON IO."""

from event_streaming_toy_example_spark.sources.generator import (  # noqa: F401
    generate_events,
    inject_duplicates,
)
from event_streaming_toy_example_spark.sources.kinesis import (  # noqa: F401
    decode_kinesis_records,
    wrap_kinesis_envelope,
)
from event_streaming_toy_example_spark.sources.ndjson import (  # noqa: F401
    read_staged_events,
    write_staged_events,
)
