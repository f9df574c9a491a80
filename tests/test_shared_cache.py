"""Lifecycle of the shared LSH pair/label caches in ``__spark_entry__``.

VERDICT r05 item 3: the session-scoped caches that let the dedup
composites share one persisted pair/label stage must not accumulate one
pinned table pair per scale tier across a multi-tier parity sweep — on
inserting a new (app, sf_dir) key, entries for other sf_dirs are
unpersisted and evicted.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def _run_family_at(spark, sf_dir):
    # dedup_components drives BOTH shared stages (pairs + labels)
    entry_mod.dedup_components(spark, sf_dir).count()


def test_lsh_caches_evict_previous_sf_dir(spark):
    entry_mod._LSH_PAIRS_CACHE.clear()
    entry_mod._LSH_LABELS_CACHE.clear()

    _run_family_at(spark, SF_A)
    assert {k[1] for k in entry_mod._LSH_PAIRS_CACHE} == {SF_A}
    pairs_a = next(iter(entry_mod._LSH_PAIRS_CACHE.values()))
    labels_a = next(iter(entry_mod._LSH_LABELS_CACHE.values()))
    assert pairs_a.storageLevel.useMemory
    assert labels_a.storageLevel.useMemory

    _run_family_at(spark, SF_B)
    # at most ONE sf_dir's tables remain cached ...
    assert {k[1] for k in entry_mod._LSH_PAIRS_CACHE} == {SF_B}
    assert {k[1] for k in entry_mod._LSH_LABELS_CACHE} == {SF_B}
    # ... and the previous tier's tables are actually unpersisted
    assert not pairs_a.storageLevel.useMemory
    assert not labels_a.storageLevel.useMemory

    # same sf_dir re-entry is a cache hit, not a rebuild/evict cycle
    pairs_b = next(iter(entry_mod._LSH_PAIRS_CACHE.values()))
    _run_family_at(spark, SF_B)
    assert next(iter(entry_mod._LSH_PAIRS_CACHE.values())) is pairs_b
    assert pairs_b.storageLevel.useMemory


def test_lsh_cache_drops_dead_app_entries_without_unpersist(spark):
    entry_mod._LSH_PAIRS_CACHE.clear()
    entry_mod._LSH_LABELS_CACHE.clear()
    # a leftover entry from a stopped session: its blocks died with the
    # app, so the evict path must drop the key WITHOUT calling
    # unpersist. The marker's unpersist raises to genuinely pin that
    # contract (ADVICE r06 — a live unthrown unpersist would otherwise
    # pass this test even if the foreign-app branch regressed).
    marker = spark.range(1)

    def _boom(*_a, **_k):
        raise AssertionError(
            "unpersist must never be called on a foreign app's entry"
        )

    marker.unpersist = _boom
    entry_mod._LSH_PAIRS_CACHE[("dead-app", SF_A)] = marker
    _run_family_at(spark, SF_A)
    assert ("dead-app", SF_A) not in entry_mod._LSH_PAIRS_CACHE
    assert {k[1] for k in entry_mod._LSH_PAIRS_CACHE} == {SF_A}
