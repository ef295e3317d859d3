from .kv_cache import PagedKVCache
from .scheduler import ContinuousBatchingScheduler, Request, RequestState

__all__ = [
    "PagedKVCache",
    "ContinuousBatchingScheduler",
    "Request",
    "RequestState",
]
