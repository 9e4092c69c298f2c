"""Microbatch incremental: split a run into per-period event-time batches.

Re-expresses MicrobatchBuilder (ref: core/dbt/materializations/
incremental/microbatch.py:12-181 — batch construction :78-98,
offset/truncate :100-170) and the per-batch execution loop
(ref: task/run.py:483-562).  Each batch recompiles the model with the
event-time window pushed into every upstream ``ref()``/``source()``
read (ref: providers.py:238-257) — on a partitioned lake that filter
becomes **partition pruning**, which is what makes a 100 TB backfill
tractable: each batch scans only its own partitions.

Batch writes use dynamic partition overwrite keyed on the truncated
event time — idempotent, so failed batches retry safely
(pinned by tests/functional/microbatch/test_microbatch.py).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass
from typing import Optional

_TRUNC = {
    "hour": lambda t: t.replace(minute=0, second=0, microsecond=0),
    "day": lambda t: t.replace(hour=0, minute=0, second=0, microsecond=0),
    "month": lambda t: t.replace(day=1, hour=0, minute=0, second=0, microsecond=0),
    "year": lambda t: t.replace(month=1, day=1, hour=0, minute=0, second=0, microsecond=0),
}


def truncate_timestamp(ts: _dt.datetime, batch_size: str) -> _dt.datetime:
    """ref: microbatch.py truncate table (:100-170)."""
    return _TRUNC[batch_size](ts)


def offset_timestamp(ts: _dt.datetime, batch_size: str, offset: int) -> _dt.datetime:
    """Offset a *truncated* timestamp by N periods (ref: microbatch.py:100-170)."""
    t = truncate_timestamp(ts, batch_size)
    if batch_size == "hour":
        return t + _dt.timedelta(hours=offset)
    if batch_size == "day":
        return t + _dt.timedelta(days=offset)
    if batch_size == "month":
        month = t.month - 1 + offset
        year = t.year + month // 12
        return t.replace(year=year, month=month % 12 + 1)
    if batch_size == "year":
        return t.replace(year=t.year + offset)
    raise ValueError(batch_size)


@dataclass
class Batch:
    start: _dt.datetime
    end: _dt.datetime

    @property
    def batch_id(self) -> str:
        return self.start.strftime("%Y%m%dT%H%M%S")


class MicrobatchBuilder:
    """Build the list of [start, end) windows for one invocation
    (ref: microbatch.py:78-98).

    - first run (no existing relation): start at ``begin``
    - incremental run: start at ``lookback`` periods before the last
      processed period (late-arrival handling)
    - ``event_time_start``/``event_time_end`` CLI args override
    """

    def __init__(
        self,
        batch_size: str,
        begin: _dt.datetime,
        lookback: int = 1,
        event_time_start: Optional[_dt.datetime] = None,
        event_time_end: Optional[_dt.datetime] = None,
        now: Optional[_dt.datetime] = None,
    ):
        self.batch_size = batch_size
        self.begin = begin
        self.lookback = lookback
        self.event_time_start = event_time_start
        self.event_time_end = event_time_end
        self.now = now or _dt.datetime.now(_dt.timezone.utc)

    def build_batches(self, is_incremental: bool) -> list[Batch]:
        if self.event_time_start is not None:
            start = truncate_timestamp(self.event_time_start, self.batch_size)
        elif is_incremental:
            start = offset_timestamp(self.now, self.batch_size, -self.lookback)
            start = max(start, truncate_timestamp(self.begin, self.batch_size))
        else:
            start = truncate_timestamp(self.begin, self.batch_size)
        end = (
            truncate_timestamp(self.event_time_end, self.batch_size)
            if self.event_time_end is not None
            else truncate_timestamp(self.now, self.batch_size)
        )
        batches: list[Batch] = []
        cur = start
        while cur <= end:
            nxt = offset_timestamp(cur, self.batch_size, 1)
            batches.append(Batch(cur, nxt))
            cur = nxt
        return batches
