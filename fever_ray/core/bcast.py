"""Per-process cache for broadcast (ray.put) objects that are NOT
zero-copy — dicts, lists of blobs, tuples of Python state.

Numpy arrays come out of the object store zero-copy, so ``ray.get`` per
batch is free for them; anything pickled (a model dict, a CSR tuple with
Python members) is re-deserialized on EVERY ``ray.get``.  Stateless-task
stages (plain ``map_batches`` functions, ``map_groups`` kernels) have no
actor ``__init__`` to hold the deserialized copy, so without a cache each
batch/group pays the full unpickle.

``cached_get(ref)`` deserializes once per worker process and serves the
cached object afterwards; a small FIFO bound keeps two interleaved
pipelines from evicting each other (the failure mode of a clear()-based
cache) while still bounding worker memory.
"""

from __future__ import annotations

_CACHE: dict = {}
_MAX_ENTRIES = 4


def cached_get(ref):
    """ray.get(ref), deserialized at most once per process per ref."""
    import ray

    key = ref.hex()
    hit = _CACHE.get(key)
    if hit is None:
        hit = ray.get(ref)
        while len(_CACHE) >= _MAX_ENTRIES:
            _CACHE.pop(next(iter(_CACHE)))
        _CACHE[key] = hit
    return hit
