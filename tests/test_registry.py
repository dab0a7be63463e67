"""Driver-gate covering set: the round driver stamps only the FIRST 50
registered queries into CORRECTNESS_r{N}.json, so registration order is a
gate artifact. These tests pin the invariants that keep the 50 slots a
covering set as the registry grows (the full gate over all queries is
test_oracle_parity)."""

from __future__ import annotations

from gfs_to_prometheus_spark.queries import (
    DRIVER_PRIORITY,
    FAMILY_MAP,
    ORACLES,
    QUERIES,
)


def test_priority_is_the_first_50_registrations():
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    assert list(QUERIES)[:50] == list(DRIVER_PRIORITY)


def test_priority_queries_all_have_oracles():
    missing = [n for n in DRIVER_PRIORITY if n not in ORACLES]
    assert not missing, f"driver-stamped slots without an oracle: {missing}"


def test_every_family_has_a_driver_stamped_representative():
    first50 = set(DRIVER_PRIORITY)
    uncovered = {
        fam: members
        for fam, members in FAMILY_MAP.items()
        if not (set(members) & first50)
    }
    assert not uncovered, (
        "families whose ONLY checks would rotate out of the driver's "
        f"CORRECTNESS file: {sorted(uncovered)}"
    )


def test_doc_counts_match_registry():
    """README/SURVEY query counts are WRITTEN by tools/sync_counts.py from
    len(QUERIES) — this asserts they were re-synced after registry growth
    (the count drifted twice in round 4 from hand-editing)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    )
    from tools.sync_counts import sync

    status = sync(len(QUERIES), write=False)
    stale = sorted(doc for doc, ok in status.items() if not ok)
    assert not stale, (
        f"{stale} query counts are stale vs len(QUERIES)={len(QUERIES)}: "
        "run `python tools/sync_counts.py`"
    )


def test_every_registered_query_is_classified():
    """A new query MUST be added to FAMILY_MAP (new family or existing) —
    that is what keeps test_every_family_... meaningful as coverage grows."""
    classified = {q for ms in FAMILY_MAP.values() for q in ms}
    unclassified = sorted(set(QUERIES) - classified)
    assert not unclassified, f"add these to FAMILY_MAP: {unclassified}"
    phantom = sorted(classified - set(QUERIES))
    assert not phantom, f"FAMILY_MAP names unregistered queries: {phantom}"
