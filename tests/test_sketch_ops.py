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
