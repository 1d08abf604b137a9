from .changelog import (
    change_event_columns,
    replay_oracle,
    synth_change_events,
    synth_change_events_py,
    testdata_change_events,
)
from .streams import (
    CHANGE_EVENT_SCHEMA,
    kafka_change_stream,
    kafka_source_available,
    rate_change_stream,
    with_claim_check_from_headers,
)

__all__ = [
    "CHANGE_EVENT_SCHEMA",
    "change_event_columns",
    "kafka_change_stream",
    "kafka_source_available",
    "rate_change_stream",
    "replay_oracle",
    "synth_change_events",
    "synth_change_events_py",
    "testdata_change_events",
    "with_claim_check_from_headers",
]
