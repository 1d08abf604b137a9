from .replay import apply_cdc_batch, read_back, replay_stream

__all__ = ["apply_cdc_batch", "read_back", "replay_stream"]
