"""Hot-key salted sessionize / as-of join (VERDICT r3 item 8): the
salted (user, ts // period) paths must be OUTPUT-IDENTICAL to the
single-shuffle paths — including an adversarial corpus that is one
single hot user, sessions spanning salt-bucket edges, and as-of
matches whose right lives many buckets back."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from searchengine_ray.pipelines.events import asof_join_latest, sessionize

US = 1_000_000
MIN = 60 * US


def _events(rows):
    """rows: (event_id, ts_us, user_id, event_type)"""
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows],
                       pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
    })


def _sess_key(df):
    return sorted(map(tuple, df[["event_id", "user_id", "session_id",
                                 "session_seq"]].to_numpy()))


def _asof_key(df):
    return sorted(map(tuple, df[["event_id", "user_id",
                                 "matched_event_id",
                                 "lag_us"]].to_numpy()))


def test_sessionize_salted_single_hot_user(ray_session):
    """One user, events every 2 min for 6 h (one giant session spanning
    every 1-h salt bucket) plus a second session after a 45-min gap:
    the stitch must chain across all buckets and keep seq continuous."""
    rows = []
    eid = 0
    for i in range(180):                      # 6 h of 2-min cadence
        rows.append((eid, i * 2 * MIN, 7, "click"))
        eid += 1
    base = 179 * 2 * MIN + 45 * MIN           # > 30-min gap → new session
    for i in range(10):
        rows.append((eid, base + i * MIN, 7, "view"))
        eid += 1
    ev = _events(rows)
    plain = sessionize(ray.data.from_arrow(ev),
                       gap_us=30 * MIN).to_pandas()
    salted = sessionize(ray.data.from_arrow(ev), gap_us=30 * MIN,
                        salt_period_us=60 * MIN).to_pandas()
    assert _sess_key(plain) == _sess_key(salted)
    # sanity: really two sessions, seq reaching 180
    assert plain["session_id"].nunique() == 2
    assert plain["session_seq"].max() == 180


def test_sessionize_salted_bucket_edge_cases(ray_session):
    """Sessions that end exactly gap-at-the-edge, single-event buckets,
    empty intervening buckets (period < gap keeps them mergeable)."""
    g = 30 * MIN
    rows = [
        # user 1: events hugging a bucket edge with gap exactly == gap
        (0, 59 * MIN, 1, "a"), (1, 89 * MIN, 1, "a"),   # 30 min → same
        (2, 89 * MIN + g + 1, 1, "a"),                   # > gap → new
        # user 2: empty intervening bucket, period(10min) < gap(30min)
        (3, 5 * MIN, 2, "a"), (4, 25 * MIN, 2, "a"),     # bucket 0 / 2
        # user 3: a single event
        (5, 123 * MIN, 3, "a"),
    ]
    ev = _events(rows)
    for period in (10 * MIN, 60 * MIN):
        plain = sessionize(ray.data.from_arrow(ev), gap_us=g).to_pandas()
        salted = sessionize(ray.data.from_arrow(ev), gap_us=g,
                            salt_period_us=period).to_pandas()
        assert _sess_key(plain) == _sess_key(salted), f"period={period}"


def test_sessionize_salted_randomized(ray_session):
    rng = np.random.RandomState(42)
    n = 4000
    rows = [(i, int(rng.randint(0, 48 * 60)) * MIN,
             int(rng.randint(0, 5)), "x") for i in range(n)]
    ev = _events(rows)
    plain = sessionize(ray.data.from_arrow(ev),
                       gap_us=7 * MIN).to_pandas()
    salted = sessionize(ray.data.from_arrow(ev), gap_us=7 * MIN,
                        salt_period_us=60 * MIN).to_pandas()
    assert _sess_key(plain) == _sess_key(salted)


def test_asof_salted_single_hot_user(ray_session):
    """One hot user; rights sparse so most lefts need a carry-in from
    an earlier bucket (several buckets back across empty ones)."""
    rows = []
    eid = 0
    for i in range(200):
        rows.append((eid, i * 3 * MIN, 9, "click"))
        eid += 1
    for ts in (0, 100 * MIN, 101 * MIN, 500 * MIN):   # sparse views
        rows.append((eid, ts, 9, "view"))
        eid += 1
    ev = _events(rows)
    plain = asof_join_latest(ray.data.from_arrow(ev)).to_pandas()
    salted = asof_join_latest(ray.data.from_arrow(ev),
                              salt_period_us=60 * MIN).to_pandas()
    assert _asof_key(plain) == _asof_key(salted)
    assert len(plain) == 200                           # every left matches


def test_asof_salted_tie_and_no_right(ray_session):
    """Equal-ts rights (tie → highest event_id), lefts before any right
    (dropped), and a user with no rights at all."""
    rows = [
        (0, 10 * MIN, 1, "view"), (1, 10 * MIN, 1, "view"),  # tie
        (2, 70 * MIN, 1, "click"),       # matches eid 1 across buckets
        (3, 5 * MIN, 1, "click"),        # before any right → dropped
        (4, 0, 2, "click"), (5, 90 * MIN, 2, "click"),  # user 2: no view
    ]
    ev = _events(rows)
    plain = asof_join_latest(ray.data.from_arrow(ev)).to_pandas()
    salted = asof_join_latest(ray.data.from_arrow(ev),
                              salt_period_us=60 * MIN).to_pandas()
    assert _asof_key(plain) == _asof_key(salted)
    assert _asof_key(plain) == [(2, 1, 1, 60 * MIN)]


def test_asof_salted_randomized(ray_session):
    rng = np.random.RandomState(7)
    n = 3000
    rows = [(i, int(rng.randint(0, 24 * 60)) * MIN,
             int(rng.randint(0, 4)),
             "click" if rng.rand() < 0.7 else "view")
            for i in range(n)]
    ev = _events(rows)
    plain = asof_join_latest(ray.data.from_arrow(ev)).to_pandas()
    salted = asof_join_latest(ray.data.from_arrow(ev),
                              salt_period_us=60 * MIN).to_pandas()
    assert _asof_key(plain) == _asof_key(salted)


@pytest.mark.parametrize("period", [7 * MIN, 180 * MIN])
def test_salted_odd_periods(ray_session, period):
    """Periods that don't divide the data range evenly."""
    rng = np.random.RandomState(3)
    rows = [(i, int(rng.randint(0, 12 * 60)) * MIN,
             int(rng.randint(0, 3)),
             "click" if i % 3 else "view") for i in range(800)]
    ev = _events(rows)
    p1 = sessionize(ray.data.from_arrow(ev), gap_us=9 * MIN).to_pandas()
    p2 = sessionize(ray.data.from_arrow(ev), gap_us=9 * MIN,
                    salt_period_us=period).to_pandas()
    assert _sess_key(p1) == _sess_key(p2)
    a1 = asof_join_latest(ray.data.from_arrow(ev)).to_pandas()
    a2 = asof_join_latest(ray.data.from_arrow(ev),
                          salt_period_us=period).to_pandas()
    assert _asof_key(a1) == _asof_key(a2)
