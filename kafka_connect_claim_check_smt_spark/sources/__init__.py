from .changelog import (
    replay_oracle,
    synth_change_events,
    synth_change_events_py,
    testdata_change_events,
)

__all__ = [
    "replay_oracle",
    "synth_change_events",
    "synth_change_events_py",
    "testdata_change_events",
]
