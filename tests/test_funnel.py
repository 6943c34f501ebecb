"""funnel_counts: ordered step completion vs hand-traced users."""

import numpy as np
import pyarrow as pa
import pytest

from searchengine_ray.pipelines.events import funnel_counts

STEPS = ["view", "click", "purchase"]

# (user, [(ts, type)...], expected depth)
USERS = [
    (0, [(1, "view"), (2, "click"), (3, "purchase")], 3),  # full
    (1, [(1, "view"), (2, "click")], 2),                   # partial
    (2, [(1, "click"), (2, "view")], 1),                   # wrong order
    (3, [(5, "view"), (5, "click")], 1),                   # tie: strictly after
    (4, [(1, "purchase"), (2, "view"), (3, "click"),
         (4, "purchase")], 3),                             # later retry counts
    (5, [(1, "error")], 0),                                # never starts
    (6, [(1, "view"), (2, "view"), (3, "click"), (1, "purchase"),
         (9, "purchase")], 3),                             # greedy earliest
]


def _ds(parts):
    import ray

    rows = [(u, ts, et) for u, evs, _ in USERS for ts, et in evs]
    return ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(
            np.array([r[1] for r in rows], dtype="datetime64[us]")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })).random_shuffle(seed=3).repartition(parts)


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("parts", [1, 5])
def test_funnel_matches_hand_trace(parts):
    got = {r["step"]: (r["event_type"], r["n_users"])
           for r in funnel_counts(_ds(parts), STEPS).to_pylist()}
    depths = [d for _, _, d in USERS]
    want = {i: (s, sum(1 for d in depths if d >= i))
            for i, s in enumerate(STEPS, start=1)}
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_retention_matches_naive():
    import ray

    from searchengine_ray.pipelines.events import retention_cohorts

    per = 24 * 3_600_000_000
    # (user, [periods active]); ts = period * per + user offset
    users = {0: [0, 0, 1, 3], 1: [0, 2], 2: [1], 3: [1, 1, 2]}
    rows = [(u, p * per + u * 1000) for u, ps in users.items()
            for p in ps]
    ds = ray.data.from_arrow(pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array(np.array([r[1] for r in rows],
                                dtype="datetime64[us]")),
    })).random_shuffle(seed=5).repartition(4)
    got = sorted((r["cohort"], r["age"], r["n_users"]) for r in
                 retention_cohorts(ds, period_hours=24).take_all())
    from collections import Counter
    c = Counter()
    for u, ps in users.items():
        cohort = min(ps)
        for age in {p - cohort for p in ps}:
            c[(cohort, age)] += 1
    want = sorted((co, age, n) for (co, age), n in c.items())
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_daily_active_naive():
    import ray

    import numpy as np
    import pyarrow as pa

    from searchengine_ray.pipelines.events import daily_active

    us = 1_000_000
    day = 86_400 * us
    ts = [0, 1 * us, day - 1, day, day + 5 * us, 3 * day]
    users = [1, 1, 2, 1, 2, 9]
    tbl = pa.table({
        "ts": pa.array(np.array(ts, np.int64), pa.timestamp("us")),
        "user_id": pa.array(users, pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(3)
    out = daily_active(ds).to_pandas().sort_values("day") \
        .reset_index(drop=True)
    assert out.to_dict("records") == [
        {"day": 0, "dau": 2, "n_events": 3},
        {"day": 1, "dau": 2, "n_events": 2},
        {"day": 3, "dau": 1, "n_events": 1},
    ]


@pytest.mark.usefixtures("ray_session")
def test_lang_confusion_consistent_with_lang_id():
    import ray

    import pyarrow as pa

    from searchengine_ray.pipelines.analysis import (
        LangIdStage,
        lang_confusion,
    )

    texts = ["the and of quick", "der und die das", "el la de los",
             "zz qq ww"]
    labels = ["en", "de", "es", "en"]
    tbl = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(labels, pa.string()),
    })
    ds = ray.data.from_arrow(tbl).repartition(2)
    got = {(r["lang"], r["lang_pred"]): r["n"]
           for r in lang_confusion(ds).to_pandas().to_dict("records")}
    pred = LangIdStage()(tbl)["lang_pred"].to_pylist()
    want = {}
    for lb, p in zip(labels, pred):
        want[(lb, p)] = want.get((lb, p), 0) + 1
    assert got == want
    assert sum(got.values()) == 4
