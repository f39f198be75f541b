"""Per-worker broadcast cache for task-based ``map_batches`` UDFs.

``ray.get`` on the same ObjectRef re-deserializes the value on EVERY
call for non-zero-copy types (dicts, object arrays) — hundreds of MB of
repeated unpickling per batch when a large lookup map is broadcast near
its size limit. Actor-pool stages solve this with ``__init__``-time
fetches, but converting a stateless task stage to an actor pool costs
actor spin-up (~1 actor/1.3 s measured) and loses task-level
elasticity. ``cached_get`` keeps the stage a plain task while fetching
each broadcast object ONCE per worker process: the deserialized value
is memoized in the worker's module state keyed by the ref, with a small
LRU bound so regenerated broadcasts don't strand old generations.

Zero-copy values (Arrow tables, numpy arrays of fixed-width dtypes)
don't need this — plasma maps them without deserialization — but using
it for them is harmless (one extra dict lookup).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any

import ray

_MAX_ENTRIES = 4

_CACHE: "OrderedDict[str, Any]" = OrderedDict()


def cached_get(ref: "ray.ObjectRef") -> Any:
    """``ray.get(ref)``, deserialized at most once per worker process
    (per ~``_MAX_ENTRIES`` live broadcasts, LRU-evicted)."""
    key = ref.hex()
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = ray.get(ref)
    _CACHE[key] = val
    if len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return val
