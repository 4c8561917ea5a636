"""Byte-bounded LRU for driver-side serving caches.

The reference serves queries from an in-RAM index fronted by a sharded LRU
cache (``include/lrucache.hpp:31-57``, 20 shards × 30 entries wired in
``KeyServer.cc:39-53``).  The rebuild's serving engines
(``operators/wand.py::Bm25QueryEngine``, ``operators/phrase.py::
PhraseQueryEngine``) memoize per-term posting slices on the driver; this
class gives that memo the same bounded-LRU semantics: a term-churn workload
holds driver memory under ``max_bytes`` by evicting least-recently-used
terms, while the current query's terms are pinned so eviction can never pull
rows out from under the in-flight scorer.

Eviction changes WHAT is cached, never results: on miss the engines re-fetch
from the (distributed) postings table, so outputs stay bit-identical — pinned
in tests/test_cache.py's churn test.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Iterable


class LruBytesCache:
    """term → (value, nbytes) with LRU eviction to a byte budget."""

    def __init__(self, max_bytes: int):
        self.max_bytes = max_bytes
        self._d: OrderedDict[str, tuple[object, int]] = OrderedDict()
        self.bytes = 0
        self.hits = 0
        self.misses = 0
        self.evictions = 0

    def __contains__(self, key: str) -> bool:
        return key in self._d

    def __len__(self) -> int:
        return len(self._d)

    def get(self, key: str):
        """Value for ``key`` (marking it most-recently-used), else None."""
        ent = self._d.get(key)
        if ent is None:
            self.misses += 1
            return None
        self._d.move_to_end(key)
        self.hits += 1
        return ent[0]

    def put(self, key: str, value: object, nbytes: int, pinned: Iterable[str] = ()) -> None:
        """Insert/replace ``key`` then evict LRU entries until the budget
        holds.  Keys in ``pinned`` (the current query's terms) are moved to
        the MRU end first and never evicted this call — if pinned entries
        alone exceed the budget the cache transiently overshoots (callers
        size-guard the query before inserting, so this is a corner, not the
        norm)."""
        if key in self._d:
            self.bytes -= self._d[key][1]
        self._d[key] = (value, nbytes)
        self._d.move_to_end(key)
        self.bytes += nbytes
        pin = set(pinned)
        pin.add(key)
        for k in list(self._d):  # iterates LRU → MRU
            if self.bytes <= self.max_bytes:
                break
            if k in pin:
                continue
            _, nb = self._d.pop(k)
            self.bytes -= nb
            self.evictions += 1

    def nbytes(self, key: str) -> int:
        """Accounted size of ``key`` (0 if absent); does not touch recency."""
        ent = self._d.get(key)
        return ent[1] if ent is not None else 0

    def keys(self):
        return self._d.keys()
