"""Shard-key scheduling family: minute-grained key enumeration and
key<->timestamp conversion.

Byte-parity port of the reference's table-shard schedulers — the piece
that turns "time advanced" into the exact partition keys to fetch:

- ``MinuteTableShardScheduler.DoSchedule``
  (/root/reference/src/ConveyorBelt.Tooling/Scheduling/
  MinuteTableShardScheduler.cs:20-47): from the last offset, one event
  per elapsed minute up to now minus a grace period, optional max
  items, new offset = last emitted minute.
- Key strategies (``GetShardKeys`` overrides): 19-digit .NET ticks
  (``MinuteTableShardScheduler.cs:49-52``), 18-digit
  (``D18MinuteTableShardScheduler.cs:15-18``), reverse timestamp
  (``ReverseTimestampMinuteTableShardScheduler.cs:15-18``), and
  modulo-10 salted buckets — ten keys per minute so a hot minute
  spreads over ten table partitions
  (``Modulo10MinuteTableShardScheduler.cs:14-29``).
- ``ShardKeyArrived.GetDateTimeOffset`` / ``DropSecondAndMilliseconds``
  / ``GetFullNumberOfHoursInBetween``
  (``Internal/DateTimeOffsetExtensions.cs``), with the reference's own
  test vectors as fixtures (DateTimeOffsetExtensionsTests.cs,
  MinuteTableShardSchedulerTests.cs).
- ``FileOffset.TryParse`` (tab-separated ``iso[\\tfile[\\toffset]]``,
  FileOffsetTests.cs vectors).

The salted-bucket idea is the same hot-key remedy the engine uses
elsewhere (doc-range buckets in the index build, hot-bucket caps in
LSH): split a skewed partition key so no single range melts.

Feeding these keys to :func:`cb.sources.read_sql_shard` closes the S2
loop: enumerate keys -> pruned point-partition reads -> parse -> index.
"""

from __future__ import annotations

import datetime as dt

# .NET ticks: 100 ns since 0001-01-01T00:00:00; integer arithmetic only
# (float seconds would drift at 10^17 magnitudes)
_EPOCH_TICKS = 621_355_968_000_000_000  # 1970-01-01 in ticks
_MAX_TICKS = 3_155_378_975_999_999_999  # DateTimeOffset.MaxValue.Ticks
_UTC = dt.timezone.utc
_UNIX_EPOCH = dt.datetime(1970, 1, 1, tzinfo=_UTC)


def to_ticks(when: dt.datetime) -> int:
    d = when.astimezone(_UTC) - _UNIX_EPOCH
    return _EPOCH_TICKS + (d.days * 86_400 + d.seconds) * 10_000_000 + d.microseconds * 10


def from_ticks(ticks: int) -> dt.datetime:
    us, rem = divmod(ticks - _EPOCH_TICKS, 10)
    return _UNIX_EPOCH + dt.timedelta(microseconds=us)


def drop_second_and_ms(when: dt.datetime) -> dt.datetime:
    """``DropSecondAndMilliseconds`` parity: truncate to the minute."""
    return when.replace(second=0, microsecond=0)


def full_hours_between(start: dt.datetime, until: dt.datetime) -> int:
    """``GetFullNumberOfHoursInBetween`` parity: ``until`` is first
    pushed to HH:59:59.999 of its hour, then whole hours are floored."""
    max_until = until.replace(minute=59, second=59, microsecond=999_000)
    return int((max_until - start).total_seconds() // 3600)


def shard_keys_for(when: dt.datetime, strategy: str = "minute") -> list[str]:
    """The partition key(s) one minute maps to, per strategy."""
    ticks = to_ticks(when)
    if strategy == "minute":
        return [f"{ticks:019d}"]
    if strategy == "d18":
        return [f"{ticks:018d}"]
    if strategy == "reverse":
        # newest-first clustering: tables sort ascending, so reverse
        # ticks put the most recent minute at the range start
        return [f"{_MAX_TICKS - ticks:019d}"]
    if strategy == "modulo10":
        return [f"{i:019d}___{ticks:019d}" for i in range(10)]
    raise ValueError(f"unknown shard-key strategy {strategy!r}")


def shard_key_datetime(shard_key: str) -> dt.datetime:
    """``ShardKeyArrived.GetDateTimeOffset`` parity: a modulo-10 key
    splits on '_' into 4 parts (ticks last); plain keys parse whole."""
    parts = shard_key.split("_")
    ticks = int(parts[3]) if len(parts) == 4 else int(shard_key)
    return from_ticks(ticks)


def minute_schedule(
    last_offset_iso: str | None,
    *,
    grace_minutes: int = 3,
    max_items: int | None = None,
    strategy: str = "minute",
    now: dt.datetime | None = None,
) -> tuple[list[dict], str]:
    """``MinuteTableShardScheduler.DoSchedule`` parity: emit one event
    per minute from the offset (exclusive) up to now minus the grace
    window; returns (events, new_last_offset_iso).  Each event carries
    the minute and its shard key(s) — feed the keys to the point-
    partition reader.  ``max_items`` caps one run (the reference's
    ``MaxItemsInAScheduleRun``); the next run resumes from the new
    offset, so progress is incremental either way."""
    now = drop_second_and_ms(now or dt.datetime.now(_UTC))
    if last_offset_iso is None:
        last = drop_second_and_ms(now - dt.timedelta(days=1))
    else:
        last = dt.datetime.fromisoformat(last_offset_iso)
        if last.tzinfo is None:
            # operator-persisted offsets may lack a zone suffix; treat
            # them as UTC instead of crashing on aware-vs-naive compare
            last = last.replace(tzinfo=_UTC)
    events: list[dict] = []
    new_last = last
    n = 1  # start from a minute after
    while now >= last + dt.timedelta(minutes=grace_minutes + n):
        new_last = drop_second_and_ms(last + dt.timedelta(minutes=n))
        events.append(
            {
                "minute": new_last.isoformat(),
                "shard_keys": shard_keys_for(new_last, strategy),
            }
        )
        if max_items is not None and n >= max_items:
            break
        n += 1
    return events, new_last.isoformat()


def parse_file_offset(offset: str) -> dict | None:
    """``FileOffset.TryParse`` parity: ``iso[\\tfile[\\toffset]]``;
    None when the ISO timestamp or the numeric offset is malformed."""
    if not offset:
        return None
    parts = offset.split("\t")
    try:
        ts = dt.datetime.fromisoformat(parts[0])
    except ValueError:
        return None
    out = {"time": ts, "file": parts[1] if len(parts) > 1 else None, "offset": 0}
    if len(parts) > 2:
        try:
            out["offset"] = int(parts[2])
        except ValueError:
            return None
    return out
