#!/usr/bin/env python
"""Rewrite the registered-query count in README.md and SURVEY.md from the
registry itself (``len(QUERIES)``).

The count drifted twice in round 4 from hand-editing; the canonical
phrase is now machine-written here and asserted in sync by
``tests/test_registry.py::test_doc_counts_match_registry``. Run after
adding queries:

    python tools/sync_counts.py
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: the canonical phrase — one N, repeated as N/N
PATTERN = re.compile(r"\d+ registered\s+queries, \d+/\d+ oracle-exact")
DOCS = ("README.md", "SURVEY.md")


def sync(n: int, write: bool = True) -> dict[str, bool]:
    """Returns {doc: was_in_sync}; rewrites stale phrases when write=True."""
    out: dict[str, bool] = {}
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        with open(path) as f:
            body = f.read()
        # the phrase may be wrapped across a line break after "registered"
        fresh = PATTERN.sub(
            lambda m: re.sub(r"\d+", str(n), m.group(0)), body
        )
        hits = PATTERN.findall(body)
        ok = bool(hits) and all(
            h == re.sub(r"\d+", str(n), h) for h in hits
        )
        out[doc] = ok
        if write and fresh != body:
            with open(path, "w") as f:
                f.write(fresh)
    return out


if __name__ == "__main__":
    from gfs_to_prometheus_spark.queries import QUERIES

    n = len(QUERIES)
    status = sync(n)
    print({"registered": n, "was_in_sync": status})
