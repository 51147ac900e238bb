"""Session cache-handle registry.

Several operators ``cache()`` an intermediate that feeds multiple arms
of one plan (minhash shingles/signatures, Jaccard shingles, simhash
fingerprints). The query functions return LAZY plans — they cannot
unpersist before the caller materializes — so each registers its handle
here and the caller releases them after the action via
``clear_caches()``. Without this, a long-lived session (or the bench
loop, where 50 queries share one JVM) accumulates gigabytes of cached
shingle tables that tax every later query's memory.

The one deliberate exception is the similarity module's RESIDENT
stores: the IVF index (``_IVF_INDEX_CACHE``), the exact-topk
ground-truth frames (``_EXACT_TOPK_CACHE``), and the PQ codes
(``_PQ_CODES_CACHE``) — residency IS the design there (build once,
probe many; at scale they are stored tables, not caches).
``clear_caches(include_ivf_index=True)`` releases ALL THREE, for
teardown paths: the flag means "also drop the resident similarity
indexes", not the IVF cell index alone (r14 review — a caller who
wants to keep the ground truth / codes hot must not pass it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_HANDLES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Record a cached/persisted DataFrame for later release.

    Returns ``df`` so call sites stay one-line:
    ``sh = register_cache(_shingled(docs).cache())``.
    """
    _HANDLES.append(df)
    return df


def clear_caches(include_ivf_index: bool = False) -> int:
    """Unpersist every registered handle; returns how many.

    ``blocking=False``: unpersist is a bookkeeping flip (the blocks are
    dropped asynchronously), so this is safe to call between queries in
    a hot loop. Handles from an already-stopped session are skipped.
    """
    released = 0
    while _HANDLES:
        df = _HANDLES.pop()
        try:
            df.unpersist(blocking=False)
            released += 1
        except Exception:
            # session gone or handle already invalid — nothing to hold
            pass
    if include_ivf_index:
        from quebic_spark.operators import similarity

        for store in (
            similarity._IVF_INDEX_CACHE,
            similarity._EXACT_TOPK_CACHE,
            similarity._PQ_CODES_CACHE,
        ):
            for cached in store.values():
                try:
                    cached.unpersist(blocking=False)
                    released += 1
                except Exception:
                    pass
            store.clear()
    return released
