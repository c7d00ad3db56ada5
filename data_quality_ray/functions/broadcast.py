"""Per-process cache for broadcast objects.

``ray.get`` of a non-numpy object (a dict / set / tuple of arrays)
UNPICKLES it on every call — a map task that does ``ray.get(ref)`` per
batch pays that deserialization once per task, which at high concurrency
dwarfs the actual work (observed: 32-CPU runs slower than 8-CPU ones).
``cached_get`` deserializes once per worker process and reuses it.
"""

from __future__ import annotations

_CACHE: dict = {}
_CAP = 8


def cached_get(ref):
    import ray

    key = ref.hex() if hasattr(ref, "hex") else id(ref)
    if key not in _CACHE:
        if len(_CACHE) >= _CAP:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = ray.get(ref)
    return _CACHE[key]
