"""Batch sessionization tests (pipeline/sessions.py)."""

import contextlib
import io
import re
from datetime import datetime

from pyspark.sql import functions as F

from dqx_spark.pipeline import sessions


def _events(spark):
    rows = [
        # user 1: three events in one session, then a 31-min gap -> new session
        (1, 1, datetime(2024, 1, 1, 10, 0, 0)),
        (2, 1, datetime(2024, 1, 1, 10, 10, 0)),
        (3, 1, datetime(2024, 1, 1, 10, 29, 0)),
        (4, 1, datetime(2024, 1, 1, 11, 0, 1)),
        # user 2: exactly 30-min gap stays in the SAME session (strict >)
        (5, 2, datetime(2024, 1, 1, 9, 0, 0)),
        (6, 2, datetime(2024, 1, 1, 9, 30, 0)),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")


def test_sessionize_gap_semantics(spark):
    out = sessions.sessionize(_events(spark), "user_id", "ts", gap_minutes=30, order_tiebreak="event_id")
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 0, 6: 0}


def test_session_stats(spark):
    out = sessions.session_stats(_events(spark), "user_id", "ts", gap_minutes=30, order_tiebreak="event_id")
    rows = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
    s = rows[(1, 0)]
    assert s["n_events"] == 3 and s["duration_secs"] == 29 * 60.0
    assert rows[(1, 1)]["n_events"] == 1 and rows[(1, 1)]["duration_secs"] == 0.0
    assert rows[(2, 0)]["n_events"] == 2


def test_sessionize_single_shuffle(spark):
    df = sessions.session_stats(_events(spark), "user_id", "ts", order_tiebreak="event_id")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # one hash exchange on user_id; lag window, running-sum window, and the
    # per-session groupBy all reuse that partitioning
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.MULTILINE)) == 1
