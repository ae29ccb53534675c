"""Shard-key scheduler family — fixtures ARE the reference's test
vectors (DateTimeOffsetExtensionsTests.cs, MinuteTableShardSchedulerTests.cs,
FileOffsetTests.cs, IndexNamer-style ticks round trips)."""

import datetime as dt

import pytest

from cb import shardkeys

UTC = dt.timezone.utc


def test_shard_key_datetime_reference_vectors():
    # DateTimeOffsetExtensionsTests.cs:28-48
    assert (
        shardkeys.shard_key_datetime("0635901169200000000").strftime("%Y%m%d%H%M")
        == "201602031722"
    )
    assert (
        shardkeys.shard_key_datetime(
            "0000000000000000006___0636403734870000000"
        ).strftime("%Y%m%d%H%M")
        == "201709070931"
    )


@pytest.mark.parametrize(
    "start,until,hours",
    [
        ("2016-02-12 05:02:06", "2016-02-12 06:01:06", 1),
        ("2016-02-11 05:02:06", "2016-02-12 06:01:06", 25),
        ("2016-02-11 05:59:59", "2016-02-12 06:00:00", 25),
        ("2016-02-11 05:00:00", "2016-02-12 05:59:59", 24),
    ],
)
def test_full_hours_between(start, until, hours):
    # DateTimeOffsetExtensionsTests.cs:16-27
    f = dt.datetime.fromisoformat(start).replace(tzinfo=UTC)
    u = dt.datetime.fromisoformat(until).replace(tzinfo=UTC)
    assert shardkeys.full_hours_between(f, u) == hours


def test_minute_schedule_hour_with_grace_3_yields_57():
    # MinuteTableShardSchedulerTests.cs:23-41
    now = dt.datetime(2026, 3, 1, 12, 0, 0, tzinfo=UTC)
    last = (now - dt.timedelta(hours=1)).isoformat()
    events, new_off = shardkeys.minute_schedule(last, grace_minutes=3, now=now)
    assert len(events) == 57
    assert events[0]["minute"] == "2026-03-01T11:01:00+00:00"
    assert new_off == "2026-03-01T11:57:00+00:00"
    # resume: a second run from the new offset with unchanged now emits
    # nothing (everything within grace)
    again, off2 = shardkeys.minute_schedule(new_off, grace_minutes=3, now=now)
    assert again == [] and off2 == new_off


def test_minute_schedule_max_items_resumes():
    now = dt.datetime(2026, 3, 1, 12, 0, 0, tzinfo=UTC)
    last = (now - dt.timedelta(hours=1)).isoformat()
    events, off = shardkeys.minute_schedule(last, max_items=10, now=now)
    assert len(events) == 10
    more, off2 = shardkeys.minute_schedule(off, max_items=100, now=now)
    assert len(events) + len(more) == 57  # no gap, no overlap
    all_minutes = [e["minute"] for e in events + more]
    assert len(set(all_minutes)) == 57


def test_strategies():
    when = shardkeys.shard_key_datetime("0635901169200000000")
    assert shardkeys.shard_keys_for(when, "minute") == ["0635901169200000000"]
    assert shardkeys.shard_keys_for(when, "d18") == ["635901169200000000"]
    mod = shardkeys.shard_keys_for(when, "modulo10")
    assert len(mod) == 10
    assert mod[6] == "0000000000000000006___0635901169200000000"
    rev = shardkeys.shard_keys_for(when, "reverse")[0]
    assert len(rev) == 19
    # reverse keys sort newest-first
    later = when + dt.timedelta(minutes=1)
    assert shardkeys.shard_keys_for(later, "reverse")[0] < rev
    # every strategy's key round-trips to its minute
    for s in ("minute", "d18", "modulo10"):
        assert shardkeys.shard_key_datetime(
            shardkeys.shard_keys_for(when, s)[0]
        ) == when


@pytest.mark.parametrize(
    "offset,ok",
    [
        ("", False),
        ("2016-01-19T21:50:00.0000000+00:00", True),
        ("2016-01-19T21:50:00.0000000+00:00\tadasa sddssdfsd", True),
        ("2016-01-19T21:50:00.0000000+00:00\tadasa sddssdfsd\t1", True),
        ("2016-01-19T21:50:00.0000000+00:00\tadasa sddssdfsd\thghg", False),
        ("2016-01-19T21:50:\tadasa sddssdfsd\t1", False),
    ],
)
def test_parse_file_offset(offset, ok):
    # FileOffsetTests.cs:15-27
    assert (shardkeys.parse_file_offset(offset) is not None) == ok


def test_read_minute_shards_end_to_end(tmp_path):
    """Scheduler -> pruned point-partition reads -> union Dataset: rows
    for due minutes arrive exactly once across resumed runs."""
    import duckdb

    from cb import sources

    now = dt.datetime(2026, 3, 1, 12, 0, 0, tzinfo=UTC)
    start = now - dt.timedelta(minutes=10)
    path = str(tmp_path / "t.duckdb")
    con = duckdb.connect(path)
    con.sql("CREATE TABLE shard (pk VARCHAR, minute VARCHAR, v BIGINT)")
    for m in range(11):  # rows for every minute in the window
        when = shardkeys.drop_second_and_ms(start + dt.timedelta(minutes=m))
        key = shardkeys.shard_keys_for(when)[0]
        for i in range(3):
            con.sql(
                f"INSERT INTO shard VALUES ('{key}', '{when.isoformat()}', {m * 10 + i})"
            )
    con.close()

    factory = lambda: duckdb.connect(path, read_only=True)
    ds, off = sources.read_minute_shards(
        "shard", factory, shard_field="pk",
        last_offset_iso=start.isoformat(), grace_minutes=3, max_items=4, now=now,
    )
    first = ds.take_all()
    assert len(first) == 12  # 4 minutes x 3 rows
    ds2, off2 = sources.read_minute_shards(
        "shard", factory, shard_field="pk",
        last_offset_iso=off, grace_minutes=3, now=now,
    )
    second = ds2.take_all()
    # grace 3 at now: minutes +1..+7 due (10-3); 4 in run one, 3 in two
    assert len(second) == 9
    seen = {r["v"] for r in first} | {r["v"] for r in second}
    assert len(seen) == 21  # exactly-once across the resume
    ds3, off3 = sources.read_minute_shards(
        "shard", factory, shard_field="pk",
        last_offset_iso=off2, grace_minutes=3, now=now,
    )
    assert ds3 is None and off3 == off2


def test_minute_schedule_accepts_naive_offsets():
    now = dt.datetime(2026, 3, 1, 12, 0, 0, tzinfo=UTC)
    aware = (now - dt.timedelta(minutes=10)).isoformat()
    naive = aware.replace("+00:00", "")
    a, off_a = shardkeys.minute_schedule(aware, now=now)
    b, off_b = shardkeys.minute_schedule(naive, now=now)
    assert [e["shard_keys"] for e in a] == [e["shard_keys"] for e in b]
