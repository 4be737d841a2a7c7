from .timing import StageTimers, device_fetch_sync, time_fn

__all__ = ["device_fetch_sync", "time_fn", "StageTimers"]
