from .replay import (
    apply_cdc_batch,
    bootstrap_snapshot,
    read_back,
    replay_stream,
    route_cdc_batch,
    snapshot_watermark,
)
from .stateful import (
    lww_changelog_stream,
    session_activity_stream,
    windowed_ingest_metrics,
)

__all__ = [
    "apply_cdc_batch",
    "bootstrap_snapshot",
    "read_back",
    "replay_stream",
    "route_cdc_batch",
    "snapshot_watermark",
    "lww_changelog_stream",
    "session_activity_stream",
    "windowed_ingest_metrics",
]
