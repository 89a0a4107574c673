"""As-of join: brute-force parity, tie/tolerance/direction semantics,
plan shape (no join node), partition independence."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dexscraper_spark.operators.asof import asof_join


def _brute_force(left_rows, right_rows, *, tolerance=None, direction="backward"):
    """Per left row: the matching right row by (time order, greatest
    tiebreak among equal times), else None."""
    expected = {}
    for key, lt, lid in left_rows:
        best = None
        for rkey, rt, val, tb in right_rows:
            if rkey != key:
                continue
            if direction == "backward" and rt > lt:
                continue
            if direction == "forward" and rt < lt:
                continue
            if tolerance is not None and abs(lt - rt) > tolerance:
                continue
            # nearer time wins; among equal times the greater tiebreak wins
            rank = (-abs(lt - rt), tb)
            if best is None or rank > best[0]:
                best = (rank, val, rt)
        expected[lid] = (best[1], best[2]) if best else (None, None)
    return expected


def _random_case(seed):
    rnd = random.Random(seed)
    keys = ["a", "b", "c"]
    right_rows = [(rnd.choice(keys), rnd.randrange(0, 100), f"v{i}", i)
                  for i in range(40)]
    left_rows = [(rnd.choice(keys), rnd.randrange(0, 100), i)
                 for i in range(30)]
    return left_rows, right_rows


@pytest.mark.parametrize("seed,tolerance,direction", [
    (1, None, "backward"),
    (2, 10, "backward"),
    (3, None, "forward"),
    (4, 7, "forward"),
])
def test_asof_matches_brute_force(spark, seed, tolerance, direction):
    left_rows, right_rows = _random_case(seed)
    left = spark.createDataFrame(left_rows, "key string, ts long, lid long")
    right = spark.createDataFrame(
        right_rows, "key string, rts long, val string, tb long")
    out = asof_join(
        left, right, keys=["key"], left_time="ts", right_time="rts",
        payload=["val"], tolerance=tolerance, direction=direction,
        tiebreak="tb", matched_time_col="matched_ts",
    ).collect()
    expected = _brute_force(left_rows, right_rows,
                            tolerance=tolerance, direction=direction)
    assert len(out) == len(left_rows)
    for row in out:
        assert (row.val, row.matched_ts) == expected[row.lid], row.lid


def test_asof_equal_time_right_row_is_visible(spark):
    """A right row at exactly t matches a left row at t (state upserted
    before the event fires — the reference's dict-lookup semantics)."""
    left = spark.createDataFrame([("k", 100, 0)], "key string, ts long, lid long")
    right = spark.createDataFrame([("k", 100, "same_t", 0)],
                                  "key string, rts long, val string, tb long")
    [row] = asof_join(left, right, keys=["key"], left_time="ts",
                      right_time="rts", payload=["val"], tiebreak="tb").collect()
    assert row.val == "same_t"


def test_asof_default_payload_and_collision_guard(spark):
    left = spark.createDataFrame([("k", 5, 1)], "key string, ts long, lid long")
    right = spark.createDataFrame([("k", 3, 9.5)], "key string, ts long, price double")
    # same time-column name on both sides must work (renamed internally)
    [row] = asof_join(left, right, keys=["key"], left_time="ts",
                      right_time="ts").collect()
    assert row.price == 9.5
    clash = spark.createDataFrame([("k", 3, 7)], "key string, ts long, lid long")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, clash, keys=["key"], left_time="ts", right_time="ts")


def test_asof_plan_has_no_join_node(spark):
    """The scale claim: one shuffle + window, zero join operators."""
    left = spark.createDataFrame([("k", 5, 1)], "key string, ts long, lid long")
    right = spark.createDataFrame([("k", 3, 9.5)], "key string, rts long, price double")
    out = asof_join(left, right, keys=["key"], left_time="ts", right_time="rts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_asof_partition_independence(spark):
    left_rows, right_rows = _random_case(99)
    left = spark.createDataFrame(left_rows, "key string, ts long, lid long")
    right = spark.createDataFrame(
        right_rows, "key string, rts long, val string, tb long")

    def run(l, r):
        rows = asof_join(l, r, keys=["key"], left_time="ts",
                         right_time="rts", payload=["val"],
                         tiebreak="tb").collect()
        return sorted((x.lid, x.val) for x in rows)

    assert run(left, right) == run(left.repartition(7), right.repartition(3))


def test_asof_on_real_events_matches_sql(spark):
    """Purchase ← latest prior click per user on the driver testdata,
    cross-checked against an independent SQL formulation (correlated
    max ≤ t then value lookup)."""
    from dexscraper_spark.sources.tables import load_table
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id",
        F.col("ts_ns").alias("p_ns"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts_ns").alias("c_ns"),
        F.col("event_id").alias("click_event"),
        F.col("value").alias("click_value"))
    out = asof_join(
        purchases, clicks, keys=["user_id"], left_time="p_ns",
        right_time="c_ns", payload=["click_event", "click_value"],
        tiebreak="click_event", matched_time_col="click_ns",
    )
    got = {r.pid: (r.click_event, r.click_ns) for r in out.collect()}

    ev.createOrReplaceTempView("ev_asof")
    expected_rows = spark.sql("""
        SELECT p.event_id AS pid,
               max_by(named_struct('ce', c.event_id, 'cn', c.ts_ns),
                      struct(c.ts_ns, c.event_id)) AS m
        FROM ev_asof p LEFT JOIN ev_asof c
          ON p.user_id = c.user_id AND c.event_type = 'click'
         AND c.ts_ns <= p.ts_ns
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id
    """).collect()
    expected = {r.pid: ((r.m.ce, r.m.cn) if r.m else (None, None))
                for r in expected_rows}
    assert got == expected and len(got) > 0


def test_asof_null_payload_value_is_not_backfilled(spark):
    """The matched row travels whole: a NULL payload value in the newest
    right row must come back NULL, not backfilled from an older row."""
    left = spark.createDataFrame([("k", 3, 1)], "key string, ts long, lid long")
    right = spark.createDataFrame(
        [("k", 1, 5.0, 10), ("k", 2, None, 20)],
        "key string, rts long, price double, qty long")
    [row] = asof_join(left, right, keys=["key"], left_time="ts",
                      right_time="rts", payload=["price", "qty"],
                      matched_time_col="mt").collect()
    assert (row.price, row.qty, row.mt) == (None, 20, 2)


def test_asof_null_right_time_never_matches(spark):
    """ADVICE r4: a snapshot with NULL time has no timeline position — it
    must not sort nulls-first and hand its payload to left rows that have
    no real earlier snapshot."""
    left = spark.createDataFrame([("a", 5, 1)], "key string, ts long, lid long")
    right = spark.createDataFrame(
        [("a", None, "ghost", 0), ("a", 7, "late", 1)],
        "key string, rts long, val string, tb long")
    out = asof_join(left, right, keys=["key"], left_time="ts",
                    right_time="rts", payload=["val"],
                    matched_time_col="mt").collect()
    assert len(out) == 1
    assert out[0]["val"] is None and out[0]["mt"] is None
