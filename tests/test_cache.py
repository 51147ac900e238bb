"""Cache-handle hygiene: operator caches must be releasable.

The dedup family caches intermediates that feed multiple arms of one
plan (shingles, signatures, simhash fingerprints). Query functions
return lazy plans, so release happens caller-side via
``quebic_spark.clear_caches()`` — these tests prove a query round-trip
plus ``clear_caches()`` leaves ZERO persisted RDDs behind (the leak the
round-4 review flagged), and that the IVF index survives by default
(its residency is the design: build once, probe many).
"""

import pytest

from quebic_spark import clear_caches
from quebic_spark.operators.dedup import (
    q_dedup_minhash_lsh,
    q_dedup_ngram_jaccard,
    q_dedup_simhash,
)
from quebic_spark.operators.similarity import (
    _IVF_INDEX_CACHE,
    q_ann_ivf_topk,
)

SF = "/root/testdata/sf0.001"


def n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture(autouse=True)
def _clean_slate(spark):
    clear_caches(include_ivf_index=True)
    spark.catalog.clearCache()
    yield
    clear_caches(include_ivf_index=True)
    spark.catalog.clearCache()


@pytest.mark.parametrize(
    "qfn", [q_dedup_minhash_lsh, q_dedup_ngram_jaccard, q_dedup_simhash]
)
def test_dedup_query_caches_released(spark, qfn):
    qfn(spark, SF).collect()
    assert n_persistent(spark) > 0, "query should have cached intermediates"
    clear_caches()
    assert n_persistent(spark) == 0


def test_clear_caches_keeps_ivf_index_by_default(spark):
    q_ann_ivf_topk(spark, SF).collect()
    assert len(_IVF_INDEX_CACHE) == 1
    clear_caches()
    # the index cache entry is still registered and still persisted
    assert len(_IVF_INDEX_CACHE) == 1
    assert n_persistent(spark) == 1
    clear_caches(include_ivf_index=True)
    assert len(_IVF_INDEX_CACHE) == 0
    assert n_persistent(spark) == 0


def test_clear_caches_idempotent_and_counts(spark):
    q_dedup_minhash_lsh(spark, SF).collect()
    released = clear_caches()
    assert released >= 2  # shingles + signatures
    assert clear_caches() == 0
