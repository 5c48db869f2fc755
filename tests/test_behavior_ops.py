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
