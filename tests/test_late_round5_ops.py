"""Late-round-5 operators: one-pass covariance (the PCA front end),
SQ8 scalar-quantized ANN, the near-dup graph census + LPA communities,
the token entropy/Zipf panel, and the JL random-projection panel."""

import numpy as np
import pytest

from ocr_service_spark.ops import similarity


def _write_embeddings(spark, out, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(out / "embeddings.parquet"))


def test_covariance_matches_numpy_and_pca_recovers_axis(spark, tmp_path):
    """The (i, j, cov) triangle must equal numpy's sample covariance,
    and the driver-side eigendecomposition on top of it must recover a
    planted dominant axis — the documented PCA step."""
    out = tmp_path / "sf"
    out.mkdir()
    rng = np.random.RandomState(7)
    d = 6
    # variance planted along e0 + e1: top principal component ~ (1,1)/√2
    base = rng.normal(0, 0.01, size=(200, d))
    t = rng.normal(0, 1.0, size=200)
    base[:, 0] += t
    base[:, 1] += t
    _write_embeddings(spark, out, base.astype(np.float32))
    got = similarity.q_embedding_covariance(spark, str(out)).collect()
    assert len(got) == d * (d + 1) // 2
    cov = np.zeros((d, d))
    for r in got:
        cov[r["i"] - 1, r["j"] - 1] = r["cov"]
        cov[r["j"] - 1, r["i"] - 1] = r["cov"]
    expected = np.cov(base.astype(np.float32).astype(np.float64), rowvar=False)
    assert np.allclose(cov, expected, atol=5e-6)  # COV_ROUND quantum
    w, v = np.linalg.eigh(cov)
    top = v[:, -1] * np.sign(v[0, -1])
    assert abs(top[0] - 1 / np.sqrt(2)) < 0.05
    assert abs(top[1] - 1 / np.sqrt(2)) < 0.05
    assert w[-1] / w.sum() > 0.9  # the planted axis dominates


def test_covariance_is_partition_invariant(spark, tmp_path):
    """Partial-moment accumulation must not depend on how rows land in
    Arrow batches: 1-partition and 8-partition runs agree exactly
    (post-rounding)."""
    out = tmp_path / "sf"
    out.mkdir()
    rng = np.random.RandomState(3)
    vecs = rng.normal(0, 0.2, size=(120, 4)).astype(np.float32)
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(8).write.parquet(str(out / "embeddings.parquet"))
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in similarity.q_embedding_covariance(spark, str(out)).collect()
    }
    one = tmp_path / "one"
    one.mkdir()
    _write_embeddings(spark, one, vecs)
    ref = {
        (r["i"], r["j"]): r["cov"]
        for r in similarity.q_embedding_covariance(spark, str(one)).collect()
    }
    assert got == ref


def test_sq8_probe_finds_planted_neighbors_and_ignores_flat_dims(
    spark, tmp_path
):
    """Vectors placed near the query must fill the SQ8 top-k ahead of a
    far cluster (8-bit codes easily separate them), and a constant
    dimension (mx == mn) must not crash or contribute distance."""
    out = tmp_path / "sf"
    out.mkdir()
    rng = np.random.RandomState(11)
    d = 8
    q = np.zeros(d)
    near = q + rng.normal(0, 0.01, size=(5, d))
    far = q + 5.0 + rng.normal(0, 0.01, size=(20, d))
    vecs = np.vstack([q, near, far])
    vecs[:, 3] = 7.25  # flat dim: identical in every vector
    _write_embeddings(spark, out, vecs.astype(np.float32))
    got = similarity.q_ann_sq8_probe(spark, str(out)).collect()
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    top5 = {r["vec_id"] for r in got[:5]}
    assert top5 == {1, 2, 3, 4, 5}  # the near cluster, ahead of all far


def _write_docs(spark, out, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))


def test_triangle_census_counts_planted_clique(spark, tmp_path):
    """Three identical docs band into one bucket -> one closed triangle
    (clustering coefficient 1.0 on that component); two more identical
    docs add one edge and zero triangles."""
    from ocr_service_spark.ops import dedup

    out = tmp_path / "sf"
    out.mkdir()
    tri_text = "alpha beta gamma delta epsilon zeta eta theta"
    pair_text = "one two three four five six seven eight nine"
    rows = [(i, tri_text, "en", "s", len(tri_text)) for i in range(3)]
    rows += [(10 + i, pair_text, "en", "s", len(pair_text)) for i in range(2)]
    # filler docs with unique text: no bands shared, graph-isolated
    for i in range(5):
        t = f"unique{i} filler{i} words{i} here{i} now{i} pad{i} x{i} y{i}"
        rows.append((100 + i, t, "en", "s", len(t)))
    _write_docs(spark, out, rows)
    got = dedup.q_neardup_triangles(spark, str(out)).collect()[0]
    assert got["n_nodes"] == 5
    assert got["n_edges"] == 4  # triangle (3) + pair (1)
    assert got["n_triangles"] == 1
    # wedges: each clique node has deg 2 -> C(2,2)=1 each; the pair's
    # deg-1 nodes contribute none
    assert got["n_wedges"] == 3
    assert abs(got["clustering_coeff"] - 1.0) < 1e-9  # 3*1/3


def test_lpa_finds_planted_communities(spark, tmp_path):
    """Two disjoint duplicate clusters (sizes 4 and 2) resolve to two
    communities labeled by their smallest member."""
    from ocr_service_spark.ops import dedup

    out = tmp_path / "sf"
    out.mkdir()
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight nine"
    rows = [(i, a, "en", "s", len(a)) for i in range(4)]
    rows += [(20 + i, b, "en", "s", len(b)) for i in range(2)]
    _write_docs(spark, out, rows)
    got = {
        r["community"]: r["n_members"]
        for r in dedup.q_lpa_communities(spark, str(out)).collect()
    }
    assert got == {0: 4, 20: 2}


def test_token_entropy_zipf_panel(spark, tmp_path):
    """A uniform source must score norm_entropy 1.0 with Zipf slope 0;
    a 1/r power-law source must fit slope ~ -1."""
    import math

    from ocr_service_spark.ops import textstats

    out = tmp_path / "sf"
    out.mkdir()
    uniform = " ".join(f"w{i}" for i in range(30))  # each token once
    # counts ~ 100/r for ranks 1..10 -> ln c = ln 100 - ln r
    zipfy = " ".join(
        " ".join([f"t{r}"] * max(1, round(100 / r))) for r in range(1, 11)
    )
    rows = [
        (0, uniform, "en", "U", len(uniform)),
        (1, zipfy, "en", "Z", len(zipfy)),
    ]
    _write_docs(spark, out, rows)
    got = {
        r["source"]: r
        for r in textstats.q_token_entropy_zipf(spark, str(out)).collect()
    }
    u = got["U"]
    assert u["n_tokens"] == 30 and u["n_types"] == 30
    assert abs(u["entropy"] - math.log(30)) < 1e-5
    assert abs(u["norm_entropy"] - 1.0) < 1e-5
    assert abs(u["zipf_slope"]) < 1e-9  # equal counts: flat fit
    z = got["Z"]
    assert -1.1 < z["zipf_slope"] < -0.9  # 100/r rounding wiggle
    assert z["top_share"] > 0.3  # rank-1 token carries 100/~295 mass


def test_rp_distortion_respects_jl_bound(spark, tmp_path):
    """All panel pairs reported; distortion clusters near 1.0 (JL with
    dp=16 on gaussian vectors); one pair cross-checked against numpy."""
    from ocr_service_spark.ops import similarity as sim

    out = tmp_path / "sf"
    out.mkdir()
    rng = np.random.RandomState(5)
    vecs = rng.normal(0, 0.2, size=(sim.RP_PANEL + 10, sim.RP_D)).astype(
        np.float32
    )
    _write_embeddings(spark, out, vecs)
    got = sim.q_rp_distortion(spark, str(out)).collect()
    n = sim.RP_PANEL
    assert len(got) == n * (n - 1) // 2
    ds = [r["distortion"] for r in got]
    assert 0.8 < float(np.mean(ds)) < 1.2
    assert all(0.3 < d < 1.9 for d in ds)  # dp=16 JL spread
    r0 = got[0]
    R = np.array(sim._rp_matrix())
    va = vecs[r0["a"]].astype(np.float64)
    vb = vecs[r0["b"]].astype(np.float64)
    od = np.linalg.norm(va - vb)
    pd_ = np.linalg.norm(va @ R - vb @ R)
    assert abs(r0["orig_dist"] - round(od, 6)) < 1e-6
    assert abs(r0["proj_dist"] - round(pd_, 6)) < 1e-5


def test_token_entropy_zipf_single_type_source_yields_nulls(spark, tmp_path):
    """A one-type source has no normalized entropy and no Zipf fit:
    both must be NULL (a 0/0 NaN would hash-diverge across engines)."""
    from ocr_service_spark.ops import textstats

    out = tmp_path / "sf"
    out.mkdir()
    rows = [(0, "same same same same", "en", "S", 19)]
    _write_docs(spark, out, rows)
    got = textstats.q_token_entropy_zipf(spark, str(out)).collect()[0]
    assert got["n_types"] == 1 and got["n_tokens"] == 4
    assert got["entropy"] == 0.0 and got["top_share"] == 1.0
    assert got["norm_entropy"] is None and got["zipf_slope"] is None


def test_hopping_windows_double_count_each_event(spark, tmp_path):
    """With size 2d / slide 1d every event lands in exactly TWO windows,
    so total window-row mass is 2x the event count and each event's two
    windows are the adjacent day-aligned starts."""
    import datetime

    from ocr_service_spark.ops import relational

    out = tmp_path / "sf"
    out.mkdir()
    rows = [
        (1, datetime.datetime(2024, 1, 5, 12, 0, 0), 10, "click", 1.0, "{}"),
        (2, datetime.datetime(2024, 1, 5, 23, 59, 59), 11, "click", 2.0, "{}"),
        (3, datetime.datetime(2024, 1, 6, 0, 0, 0), 12, "view", 4.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = relational.q_hopping_window_counts(spark, str(out)).collect()
    assert sum(r["n_events"] for r in got) == 2 * 3
    clicks = {
        (str(r["window_start"]), r["n_events"], r["total_value"])
        for r in got
        if r["event_type"] == "click"
    }
    # both clicks are on Jan 5: windows [Jan 4, Jan 6) and [Jan 5, Jan 7)
    assert ("2024-01-04 00:00:00", 2, 3.0) in clicks
    assert ("2024-01-05 00:00:00", 2, 3.0) in clicks


def test_new_ops_partition_invariant(spark, tmp_path):
    """domain_cap_sample, lpa_communities and hopping_window_counts must
    not depend on how input rows land in partitions (the salted
    two-stage top-k, the synchronous label rounds, and the Expand-based
    window assignment are all order-free by construction)."""
    import datetime

    from ocr_service_spark.ops import dedup, relational, textstats

    def _write(n_parts):
        out = tmp_path / f"sf{n_parts}"
        out.mkdir()
        dup_a = "alpha beta gamma delta epsilon zeta eta theta"
        dup_b = "one two three four five six seven eight nine"
        rows = [(i, dup_a, "en", f"s{i % 3}", len(dup_a)) for i in range(30)]
        rows += [(100 + i, dup_b, "en", "s0", len(dup_b)) for i in range(25)]
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        ).repartition(n_parts).write.parquet(str(out / "documents.parquet"))
        ev = [
            (
                i,
                datetime.datetime(2024, 1, 1 + i % 9, i % 24, 0, 0),
                i % 7,
                ["click", "view"][i % 2],
                float(i),
                "{}",
            )
            for i in range(200)
        ]
        spark.createDataFrame(
            ev,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).repartition(n_parts).write.parquet(str(out / "events.parquet"))
        return str(out)

    def _snapshot(sf):
        return (
            sorted(tuple(r) for r in textstats.q_domain_cap_sample(spark, sf).collect()),
            sorted(tuple(r) for r in dedup.q_lpa_communities(spark, sf).collect()),
            sorted(
                tuple(r)
                for r in relational.q_hopping_window_counts(spark, sf).collect()
            ),
        )

    assert _snapshot(_write(1)) == _snapshot(_write(7))


def test_event_transitions_markov_rows(spark, tmp_path):
    """A planted deterministic stream click->view->click->view per user
    yields exactly the two cross transitions with p = 1.0, and row
    probabilities always sum to 1 per from-state."""
    import datetime

    from ocr_service_spark.ops import relational

    out = tmp_path / "sf"
    out.mkdir()
    ev = []
    for u in range(3):
        for i in range(6):
            ev.append(
                (
                    u * 10 + i,
                    datetime.datetime(2024, 1, 1, 0, i, 0),
                    u,
                    ["click", "view"][i % 2],
                    1.0,
                    "{}",
                )
            )
    spark.createDataFrame(
        ev,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(str(out / "events.parquet"))
    got = {
        (r["from_type"], r["to_type"]): r
        for r in relational.q_event_transitions(spark, str(out)).collect()
    }
    assert set(got) == {("click", "view"), ("view", "click")}
    assert got[("click", "view")]["n"] == 9  # 3 users x 3 c->v hops
    assert got[("view", "click")]["n"] == 6
    assert got[("click", "view")]["p"] == 1.0
    assert got[("view", "click")]["p"] == 1.0
