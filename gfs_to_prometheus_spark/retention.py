"""Tiered retention (W4): drop aged RAW/chunk partitions while preserving
downsampled tiers — the reference's 365d TSDB horizon
(/root/reference/internal/tsdb/writer.go:27) generalized to per-tier
horizons (raw < 5m < 1h < 1d), per the north_rule.

Partition drops are metadata-only: the day partition directory is removed
(Iceberg: `DELETE WHERE day < horizon` / expire_snapshots; sandbox
parquet: rm of the `part=<day>` dir). No data rewrite ever happens.

Late-data interaction (SURVEY.md §7 hard-part d): a late sample older
than the raw horizon but within the 30d out-of-order window
(/root/reference/internal/tsdb/writer.go:32) must still update surviving
tiers — pipeline.run() re-rolls any partition whose lineage row is
missing OR whose input re-appears, and retention never drops a tier
partition that a finer tier could still feed.
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass, field


@dataclass
class RetentionPolicy:
    """Keep-horizons per tier, in days. None = keep forever."""

    horizons: dict[str, int | None] = field(
        default_factory=lambda: {
            "chunks": 30,
            "rollup_5m": 90,
            "rollup_1h": 365,
            "rollup_1d": None,
        }
    )


def list_parts(root: str, table: str, part_col: str = "part") -> list[str]:
    d = os.path.join(root, table)
    if not os.path.isdir(d):
        return []
    return sorted(
        p.split("=", 1)[1] for p in os.listdir(d) if p.startswith(f"{part_col}=")
    )


def apply_retention(
    root: str,
    policy: RetentionPolicy,
    today_part: str,
    part_col: str = "part",
) -> dict[str, list[str]]:
    """Drop partitions strictly older than (today - horizon) per tier.

    Partitions are day strings 'YYYY-MM-DD' (lexicographic == chronologic).
    Returns {table: [dropped parts]}.
    """
    from datetime import date, timedelta

    today = date.fromisoformat(today_part)
    dropped: dict[str, list[str]] = {}
    for table, days in policy.horizons.items():
        if days is None:
            continue
        cutoff = (today - timedelta(days=days)).isoformat()
        for part in list_parts(root, table, part_col):
            if part < cutoff:
                shutil.rmtree(os.path.join(root, table, f"{part_col}={part}"))
                dropped.setdefault(table, []).append(part)
    return dropped
