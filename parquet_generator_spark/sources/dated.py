"""Date-suffixed source discovery.

Reference parity: `ElasticsearchIndexUtils.getRecentNDaysIndices`
(used at Bootstrap.java:264) resolves indices named
``<prefix>YYYYMMDD`` for the most recent N days. Here a "source" is
any path (directory entry, ES index, table partition) following the
same convention; non-date suffixes (e.g. ``event_516411130`` in the
reference's own fixtures) are skipped.

At scale this is the partition-pruning front door: discovery happens
driver-side over names only (no data touched), and the resulting
paths feed one ``spark.read`` with a ``source_date`` partition
column so downstream date predicates prune whole files.
"""

from __future__ import annotations

import os
import re
from datetime import date, datetime, timedelta

_DATE_RE = re.compile(r"^(\d{8})$")


def parse_dated_name(name: str, prefix: str) -> date | None:
    """``event_20191002`` -> date(2019,10,2); None if not dated."""
    if not name.startswith(prefix):
        return None
    m = _DATE_RE.match(name[len(prefix):])
    if not m:
        return None
    try:
        return datetime.strptime(m.group(1), "%Y%m%d").date()
    except ValueError:
        return None


def recent_n_days(names: list[str], prefix: str, n_days: int,
                  today: date) -> list[tuple[date, str]]:
    """The reference's recent-N-days index selection over a name list."""
    lo = today - timedelta(days=n_days)
    out = []
    for name in names:
        d = parse_dated_name(name, prefix)
        if d is not None and lo <= d <= today:
            out.append((d, name))
    return sorted(out)


def discover_recent_sources(base_dir: str, prefix: str, n_days: int,
                            today: date) -> list[tuple[date, str]]:
    """List ``(date, path)`` for dated entries under ``base_dir``."""
    names = [n for n in os.listdir(base_dir) if not n.startswith(".")]
    return [(d, os.path.join(base_dir, n))
            for d, n in recent_n_days(names, prefix, n_days, today)]
