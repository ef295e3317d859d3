from .engine import DecodeEngine, StreamEvent
from .kv_cache import PagedKVCache
from .scheduler import ContinuousBatchingScheduler, Request, RequestState

__all__ = [
    "DecodeEngine",
    "StreamEvent",
    "PagedKVCache",
    "ContinuousBatchingScheduler",
    "Request",
    "RequestState",
]
