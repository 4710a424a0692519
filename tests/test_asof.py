"""As-of join semantics (operators/asof.py) on hand-built frames."""

from datetime import datetime

import pytest

from ner_spark.operators.asof import asof_join, latest_per_key_ts


def _ts(m):
    return datetime(2024, 1, 1, 0, m, 0)


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.createDataFrame(
        [
            (1, "u", _ts(5), 10.0),   # before any ref -> NULL match
            (2, "u", _ts(10), 20.0),  # equal-ts ref -> inclusive match
            (3, "u", _ts(12), 30.0),  # between refs -> ts 10
            (4, "u", _ts(40), 40.0),  # after all -> latest ref (30)
            (5, "v", _ts(9), 50.0),   # other key, no ref rows at all
        ],
        "event_id bigint, user_id string, ts timestamp, value double",
    )
    ref = spark.createDataFrame(
        [
            ("u", _ts(10), 1.0),
            ("u", _ts(20), None),  # NULL payload must still count as a match
            ("u", _ts(30), 3.0),
        ],
        "user_id string, ts timestamp, value double",
    )
    return probe, ref


def test_asof_semantics(frames):
    probe, ref = frames
    out = {
        r["event_id"]: (r["ref_ts"], r["ref_value"])
        for r in asof_join(
            probe, ref, key="user_id", ts_col="ts", payload=["value"]
        ).collect()
    }
    assert out[1] == (None, None)          # nothing at-or-before
    assert out[2] == (_ts(10), 1.0)        # equal ts is inclusive
    assert out[3] == (_ts(10), 1.0)
    assert out[4] == (_ts(30), 3.0)
    assert out[5] == (None, None)          # key with no reference rows


def test_null_payload_does_not_skip_back(frames):
    probe, ref = frames
    extra = probe.sparkSession.createDataFrame(
        [(9, "u", _ts(25), 0.0)],
        "event_id bigint, user_id string, ts timestamp, value double",
    )
    row = asof_join(
        extra, ref, key="user_id", ts_col="ts", payload=["value"]
    ).collect()[0]
    # the ts-20 ref row has a NULL value; the match must still be ts 20
    # with a NULL payload, NOT fall back to the ts-10 row
    assert row["ref_ts"] == _ts(20) and row["ref_value"] is None


def test_probe_columns_preserved(frames):
    probe, ref = frames
    out = asof_join(probe, ref, key="user_id", ts_col="ts", payload=["value"])
    assert out.columns == ["event_id", "user_id", "ts", "value", "ref_ts", "ref_value"]
    assert out.count() == probe.count()  # left semantics: every probe row


def test_latest_per_key_ts(spark):
    df = spark.createDataFrame(
        [("u", _ts(1), 1, 10.0), ("u", _ts(1), 2, 20.0), ("u", _ts(2), 3, 30.0)],
        "user_id string, ts timestamp, event_id bigint, value double",
    )
    got = {
        (r["user_id"], r["ts"]): r["value"]
        for r in latest_per_key_ts(
            df, key="user_id", ts_col="ts", payload=["value"], pick_by="event_id"
        ).collect()
    }
    # duplicate (key, ts) collapses to the largest event_id's payload
    assert got == {("u", _ts(1)): 20.0, ("u", _ts(2)): 30.0}
