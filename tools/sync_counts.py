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

#: the canonical phrase. Only the registered count and the DENOMINATOR
#: are machine-written; the oracle-exact NUMERATOR is left as authored
#: (ADVICE r5: blanket digit-rewriting silently restored a false
#: all-exact claim whenever a query lost oracle-exactness).
PATTERN = re.compile(
    r"(\d+)( registered\s+queries, )(\d+)(/)(\d+)( oracle-exact)"
)
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
            lambda m: f"{n}{m.group(2)}{m.group(3)}{m.group(4)}{n}{m.group(6)}",
            body,
        )
        hits = PATTERN.findall(body)
        ok = bool(hits) and all(
            h[0] == str(n) and h[4] == str(n) for h in hits
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
