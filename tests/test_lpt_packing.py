"""Cost-model LPT bin packing: a pathological skew (one giant split
among many small ones) must still produce balanced bins — the guarantee
behind the media stage's straggler-free task layout."""

from __future__ import annotations

from ocr_service_spark.pipeline.extract import _lpt_pack, _split_cost_ms


def _bin_costs(bins, cost_by_key):
    return [
        sum(cost_by_key[(p, rg)] for p, rg in zip(paths, rgs))
        for paths, rgs in bins
    ]


def test_lpt_balances_skewed_splits():
    # 1 giant split (100 rows, 100 MB) + 63 small ones (5 rows, 1 MB)
    splits = [("big.parquet", 0, 100 * 10**6, 100)]
    splits += [(f"s{i}.parquet", 0, 10**6, 5) for i in range(63)]
    cost = {(p, rg): _split_cost_ms(rows, b) for p, rg, b, rows in splits}
    bins = _lpt_pack(splits, 16)
    costs = _bin_costs(bins, cost)
    assert len(bins) == 16
    # every split assigned exactly once
    assert sum(len(p) for p, _ in bins) == 64
    # LPT guarantee: max bin ≤ (4/3) OPT; OPT ≥ max(single split, mean)
    opt_lb = max(max(cost.values()), sum(cost.values()) / 16)
    assert max(costs) <= opt_lb * 4 / 3 + 1e-9
    # the giant split sits alone-ish: its bin contains no other... or the
    # spread of the remaining bins is tight
    small_bins = sorted(costs)[:-1]
    assert max(small_bins) <= min(small_bins) * 2 + max(cost.values()) * 0.01 + 1e-9


def test_lpt_more_bins_than_splits_collapses():
    splits = [(f"s{i}.parquet", 0, 10**6, 5) for i in range(4)]
    bins = _lpt_pack(splits, 32)
    assert len(bins) == 4  # one split per bin, no empties


def test_lpt_deterministic():
    splits = [(f"s{i}.parquet", i % 3, (i + 1) * 10**5, i + 1) for i in range(20)]
    assert _lpt_pack(splits, 7) == _lpt_pack(splits, 7)


def test_parse_size_bytes_and_scan_estimate():
    from ocr_service_spark.ops import parse_size_bytes

    assert parse_size_bytes("16m") == 16 << 20
    assert parse_size_bytes("128k") == 128 << 10
    assert parse_size_bytes("1g") == 1 << 30
    assert parse_size_bytes("134217728") == 128 << 20
    assert parse_size_bytes("16MB") == 16 << 20  # case/suffix-insensitive
