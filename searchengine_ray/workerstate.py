"""Per-worker lazily-constructed stage state for task-pool ``map_batches``.

An actor-pool stage (``map_batches(Cls, concurrency=N)``) pays a fixed actor
spawn + teardown per pipeline run (~0.9 s measured warm on this node) and
pins the stage's parallelism to N. That trade is right when the state is
genuinely heavy — an index shard, a model, a multi-GB lookup — and wrong
when the state is a memo dict or a 1 KiB parameter block that builds in
microseconds: there the spawn is pure overhead and the fixed pool starves
the stage (Ray's task pool elastically uses every warm worker).

``per_worker(Cls, **kwargs)`` keeps the callable-class authoring style but
runs on the task pool: the instance is constructed once per worker process
(cached in this module's global, which resolves inside the worker's own
import of the module) and reused across batches and across pipeline runs —
the same once-per-worker setup semantics as an actor's ``__init__`` with
zero spawn cost. Stages whose state is heavy (build lemmatizer shards,
query serving, multimodal decoders) stay actor pools.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}
_CACHE_MAX = 64  # distinct (cls, kwargs) configs per worker; state is small


def per_worker(cls: type, **ctor_kwargs) -> Callable:
    """A plain function wrapping ``cls(**ctor_kwargs).__call__`` with the
    instance cached per worker process. Kwargs must be picklable and
    repr-stable (they key the cache)."""
    key = (
        cls.__module__,
        cls.__qualname__,
        tuple(sorted((k, repr(v)) for k, v in ctor_kwargs.items())),
    )

    def stage(batch):
        inst = _CACHE.get(key)
        if inst is None:
            if len(_CACHE) >= _CACHE_MAX:
                _CACHE.clear()
            inst = _CACHE[key] = cls(**ctor_kwargs)
        return inst(batch)

    # surface the class name in Ray's operator/stage display
    stage.__name__ = cls.__name__
    stage.__qualname__ = cls.__qualname__
    return stage
