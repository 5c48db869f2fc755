"""Behavior analytics: funnel ordering strictness on constructed
event sequences (the oracle comparison covers the bulk semantics)."""

from __future__ import annotations

import datetime


def _ev(uid, etype, minute):
    return (uid, etype, datetime.datetime(2024, 1, 1, 0, minute))


def test_funnel_requires_strict_stage_order(spark, tmp_path):
    import pyspark.sql.functions as F

    rows = [
        # u1: full ordered funnel
        _ev(1, "view", 1), _ev(1, "click", 2), _ev(1, "purchase", 3),
        # u2: purchase BEFORE click -> stops at click stage
        _ev(2, "view", 1), _ev(2, "purchase", 2), _ev(2, "click", 3),
        # u3: click before view -> a later click still advances
        _ev(3, "click", 1), _ev(3, "view", 2), _ev(3, "click", 4),
        # u4: view only
        _ev(4, "view", 1),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    tbl = tmp_path / "events.parquet"
    df.write.parquet(str(tbl))

    # point load_table at the constructed dir via a shim
    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.behavior_ops import funnel_conversion

    out = funnel_conversion(spark, str(tmp_path)).first()
    # views: u1,u2,u3,u4; clicks-after-view: u1,u2 (click@3 > view@1), u3 (click@4 > view@2)
    # purchases-after-click: u1 only (u2's purchase precedes its click)
    assert (out["n_view"], out["n_click"], out["n_purchase"]) == (4, 3, 1)


def test_sessionization_gap_30min_cut(spark, tmp_path):
    """Sessions split exactly at >30 min of inactivity; a gap of
    exactly 30:00 does NOT split (strict >)."""
    import datetime

    def ev(uid, eid, minute):
        return (uid, eid, datetime.datetime(2024, 1, 1, 0) + datetime.timedelta(minutes=minute))

    rows = [
        # u1: 0, 10, 45 -> gap 35min splits: 2 sessions
        ev(1, 1, 0), ev(1, 2, 10), ev(1, 3, 45),
        # u2: 0, 30 -> gap exactly 30:00 does NOT split: 1 session
        ev(2, 4, 0), ev(2, 5, 30),
        # u3: single event: 1 session
        ev(3, 6, 0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    df.write.parquet(str(tmp_path / "events.parquet"))

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.behavior_ops import sessionization_gap

    out = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in sessionization_gap(spark, str(tmp_path)).collect()}
    assert out == {1: (2, 3), 2: (1, 2), 3: (1, 1)}


def test_event_sequence_ngrams_ordered_within_user(spark, tmp_path):
    """Trigrams respect per-user (ts, event_id) order and never cross
    users; ties on ts break by event_id."""
    import datetime

    t0 = datetime.datetime(2024, 1, 1)

    rows = [
        # u1: a b c d -> trigrams a>b>c, b>c>d  (two events share ts:
        # event_id orders them)
        (1, 1, t0, "a"), (1, 2, t0, "b"),
        (1, 3, t0 + datetime.timedelta(minutes=1), "c"),
        (1, 4, t0 + datetime.timedelta(minutes=2), "d"),
        # u2: a b c -> a>b>c  (no cross-user d>a>b)
        (2, 5, t0, "a"), (2, 6, t0 + datetime.timedelta(minutes=1), "b"),
        (2, 7, t0 + datetime.timedelta(minutes=2), "c"),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp, event_type string")
    df.write.parquet(str(tmp_path / "events.parquet"))

    from experiment_flink_cdc_connectors_postgres_datastream_spark.queries.behavior_ops import event_sequence_ngrams

    out = {r["trigram"]: r["n"] for r in event_sequence_ngrams(spark, str(tmp_path)).collect()}
    assert out == {"a>b>c": 2, "b>c>d": 1}
