from .replay import (
    apply_cdc_batch,
    bootstrap_snapshot,
    read_back,
    replay_stream,
    route_cdc_batch,
    snapshot_watermark,
)

__all__ = [
    "apply_cdc_batch",
    "bootstrap_snapshot",
    "read_back",
    "replay_stream",
    "route_cdc_batch",
    "snapshot_watermark",
]
