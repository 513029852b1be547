"""Guards for the mergeable quantile sketch: the interpolated estimate
must stay within one bucket width of the exact quantile (the histogram
error bound), and the sketch must be partitioning-invariant (buckets
merge by addition, so the plan's shuffle layout cannot change the
result)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_service_spark.ops import relational


@pytest.fixture(scope="module")
def sf001():
    import os

    d = "/root/testdata/sf0.001"
    if not os.path.isdir(d):
        pytest.skip("testdata absent")
    return d


def test_quantile_sketch_error_bound(spark, sf001):
    rows = relational.q_quantile_sketch(spark, sf001).collect()
    assert {float(r["q"]) for r in rows} == set(relational.QSKETCH_QS)
    ev = relational.load(spark, sf001, "events")
    lo, hi = ev.agg(F.min("value"), F.max("value")).first()
    width = (hi - lo) / relational.QSKETCH_W
    for r in rows:
        assert r["abs_err"] <= width, (r["q"], r["abs_err"], width)


def test_quantile_sketch_partition_invariant(spark, sf001, monkeypatch):
    """Repartitioning the input must not move a single estimate: the
    histogram is a sum per bucket (mergeable), ranks are exact."""
    base = {r["q"]: r["est"] for r in relational.q_quantile_sketch(spark, sf001).collect()}
    orig_load = relational.load

    def skewed_load(spark_, sf_dir_, name):
        df = orig_load(spark_, sf_dir_, name)
        return df.repartition(37) if name == "events" else df

    monkeypatch.setattr(relational, "load", skewed_load)
    alt = {r["q"]: r["est"] for r in relational.q_quantile_sketch(spark, sf001).collect()}
    assert base == alt


def test_zorder_beats_natural_layout(spark, sf001):
    """Z-order clustering must strictly out-prune the natural
    time-ordered layout on box queries: fewer blocks scanned, higher
    skip fraction — the property that justifies paying the clustering
    sort at all."""
    rows = {r["layout"]: r for r in relational.q_zorder_locality(spark, sf001).collect()}
    assert rows["zorder"]["avg_blocks_scanned"] < rows["natural"]["avg_blocks_scanned"]
    assert rows["zorder"]["skip_fraction"] > rows["natural"]["skip_fraction"]
    assert rows["zorder"]["n_blocks"] == rows["natural"]["n_blocks"] == relational.ZORDER_BLOCKS


def test_quantile_sketch_degenerate_constant_column(spark, tmp_path):
    """All-equal values: width collapses, every row lands in bucket 0,
    and both the estimate and the exact quantile equal the constant —
    no division blowup, no NaN."""
    out = tmp_path / "sf"
    out.mkdir()
    rows = [(i, None, i % 3, "click", 7.5, "{}") for i in range(50)]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = relational.q_quantile_sketch(spark, str(out)).collect()
    assert len(got) == len(relational.QSKETCH_QS)
    for r in got:
        assert r["est"] == r["exact_v"] == 7.5
        assert r["abs_err"] == 0.0


def test_zorder_degenerate_single_user(spark, tmp_path):
    """One user (zero spread on the u axis): both layouts degenerate to
    pure time order and must score identically — the measurement cannot
    invent a z-order win where no second dimension exists."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 42, "click", 1.0, "{}")
        for i in range(200)
    ]
    out = tmp_path / "sf"
    out.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = {r["layout"]: r for r in relational.q_zorder_locality(spark, str(out)).collect()}
    assert got["zorder"]["avg_blocks_scanned"] == got["natural"]["avg_blocks_scanned"]


def test_hard_negatives_exclude_anchor_label(spark, sf001):
    """Every mined negative must carry a label different from its
    anchor's, ranks must be contiguous 1..K per anchor, and similarity
    must be non-increasing with rank."""
    from ocr_service_spark.ops import similarity

    emb = relational.load(spark, sf001, "embeddings")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = similarity.q_hard_negatives(spark, sf001).collect()
    by_q = {}
    for r in rows:
        assert labels[r["vec_id"]] != labels[r["qid"]]
        by_q.setdefault(r["qid"], []).append((r["rank"], r["cos"]))
    assert len(by_q) == similarity.HN_NQ
    for q, rs in by_q.items():
        rs.sort()
        assert [r for r, _ in rs] == list(range(1, similarity.HN_K + 1))
        coss = [c for _, c in rs]
        assert coss == sorted(coss, reverse=True)


def test_retention_offset_zero_is_total(spark, sf001):
    """Every cohort's day-0 cell must equal its own size (retention 1.0)
    — the anchor the rest of the matrix is relative to."""
    rows = relational.q_retention_cohorts(spark, sf001).collect()
    assert rows
    for r in rows:
        if r["day_offset"] == 0:
            assert r["retention"] == 1.0


def test_psi_alarm_fires_on_planted_drift(spark, tmp_path):
    """A value distribution shifted in the second half must push PSI
    past the 0.2 alert threshold; the stationary type must not."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        ts = base + datetime.timedelta(minutes=i)
        # 'drifty': values jump from ~[0,1) to ~[50,51) halfway through
        v = float(i % 10) / 10 + (50.0 if i >= 200 else 0.0)
        rows.append((i, ts, i % 7, "drifty", v, "{}"))
        # 'steady': same distribution throughout
        rows.append((1000 + i, ts, i % 7, "steady", float(i % 10), "{}"))
    out = tmp_path / "sf"
    out.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = {r["event_type"]: r for r in relational.q_psi_drift(spark, str(out)).collect()}
    assert got["drifty"]["drifted"] and got["drifty"]["psi"] > relational.PSI_ALERT
    assert not got["steady"]["drifted"]


def test_ab_test_null_result_on_balanced_stream(spark, sf001):
    """The synthetic stream has no real treatment effect: the z-test
    must come back non-significant (an experimentation harness that
    fires on noise is worse than none)."""
    r = relational.q_ab_test(spark, sf001).collect()
    assert len(r) == 1 and not r[0]["significant"]


def test_ab_test_detects_planted_effect(spark, tmp_path):
    """A strong planted treatment effect (arm A converts, arm B never
    does) must produce a significant z."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(100):
        rows.append((eid, base, u, "click", 1.0, "{}")); eid += 1
        # even users (arm A) purchase an hour later; odd users never do
        if u % 2 == 0:
            rows.append(
                (eid, base + datetime.timedelta(hours=1), u, "purchase", 1.0, "{}")
            ); eid += 1
    out = tmp_path / "sf"
    out.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    r = relational.q_ab_test(spark, str(out)).collect()[0]
    assert r["conv_a"] == 1.0 and r["conv_b"] == 0.0
    assert r["significant"] and r["z"] > relational.AB_Z_CRIT


def test_funnel_horizon_boundary_inclusive(spark, tmp_path):
    """A step landing exactly AT the horizon converts; one microsecond
    past it does not — pins the <= boundary both twins implement."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    day = datetime.timedelta(days=1)
    us = datetime.timedelta(microseconds=1)
    rows = [
        # user 1: view exactly at +1 day -> counts; purchase exactly at
        # +1 day after the view -> counts (full depth 3)
        (1, base, 1, "click", 1.0, "{}"),
        (2, base + day, 1, "view", 1.0, "{}"),
        (3, base + day + day, 1, "purchase", 1.0, "{}"),
        # user 2: view one microsecond past the horizon -> depth stops at 1
        (4, base, 2, "click", 1.0, "{}"),
        (5, base + day + us, 2, "view", 1.0, "{}"),
    ]
    out = tmp_path / "sf"
    out.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = {r["depth"]: r["n_users"] for r in relational.q_funnel_conversion(spark, str(out)).collect()}
    assert got == {1: 2, 2: 1, 3: 1}


def test_volume_anomaly_flags_planted_burst(spark, tmp_path):
    """30 steady days plus one 10x burst day: the burst day (and only
    it) must break the modified-z threshold, and a perfectly constant
    type must flag nothing (MAD = 0 guard)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(30):
        # small deterministic jitter keeps MAD > 0 (a constant series
        # has MAD = 0 and by definition flags nothing)
        n = (95 + (d * 7) % 11) if d != 15 else 1000  # burst on day 15
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=d, seconds=i), 1, "bursty", 1.0, "{}")
            ); eid += 1
        for i in range(50):  # perfectly constant arm
            rows.append(
                (eid, base + datetime.timedelta(days=d, seconds=i), 2, "flat", 1.0, "{}")
            ); eid += 1
    out = tmp_path / "sf"
    out.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = {r["event_type"]: r for r in relational.q_volume_anomalies(spark, str(out)).collect()}
    assert got["bursty"]["n_anomalous"] == 1
    assert got["flat"]["n_anomalous"] == 0 and got["flat"]["mad"] == 0.0


def test_dq_checks_fail_on_planted_violations(spark, tmp_path):
    """Planted contract violations — a duplicate event_id, a NULL ts, a
    NULL user_id, an out-of-range value, a foreign event type — must
    each fail their check with a fractional observed value; clean
    dimensions keep passing."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), i % 5, "click", 10.0, "{}")
        for i in range(96)
    ]
    rows += [
        (0, base, 1, "click", 10.0, "{}"),                      # dup event_id
        (200, None, 1, "click", 10.0, "{}"),                    # null ts
        (201, base, None, "click", 10.0, "{}"),                 # null user_id
        (202, base, 1, "click", 99999.0, "{}"),                 # out of range
        (203, base, 1, "mystery", 10.0, "{}"),                  # foreign type
    ]
    out = tmp_path / "sf"
    out.mkdir()
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = {r["check"]: r for r in relational.q_dq_checks(spark, str(out)).collect()}
    for name in ("event_id_unique", "ts_complete", "user_id_complete",
                 "event_type_allowed"):
        assert not got[name]["passes"], name
        assert 0 < got[name]["observed"] < 1
    # 1 bad value in 101 rows = 99.0099% in range — above the 0.99 bar
    assert got["value_in_range"]["passes"]


def test_hll_distinct_error_bound(spark, sf001):
    """HLL raw estimate with m=256 registers has standard error
    1.04/sqrt(m) ≈ 6.5%; assert a loose 4-sigma bound (26%) plus the
    structural invariants (register count, scaled harmonic sum)."""
    r = relational.q_hll_distinct(spark, sf001).first()
    assert r["m"] == relational.HLL_M
    assert 0 < r["registers_set"] <= relational.HLL_M
    assert r["s_scaled"] >= r["registers_set"]  # each register adds ≥1
    assert r["exact_distinct"] > 0
    assert r["err_ppm"] < 260_000, (r["estimate"], r["exact_distinct"])


def test_hll_distinct_partition_invariant(spark, sf001, monkeypatch):
    """Per-register max merges from any partitioning — the estimate must
    be bit-identical under a different input layout."""
    base = relational.q_hll_distinct(spark, sf001).first()
    orig_load = relational.load

    def reload(s, d, name):
        df = orig_load(s, d, name)
        return df.repartition(13) if name == "lineitem" else df

    monkeypatch.setattr(relational, "load", reload)
    alt = relational.q_hll_distinct(spark, sf001).first()
    assert alt["estimate"] == base["estimate"]
    assert alt["s_scaled"] == base["s_scaled"]
