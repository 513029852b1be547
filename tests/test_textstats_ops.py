"""Unit guards for the textstats training-data operators beyond the
oracle gate: DSIR importance weights must actually separate the target
distribution from the rest of the corpus."""

from __future__ import annotations

from ocr_service_spark.ops import textstats


def test_dsir_separates_target_language(spark, tmp_path):
    """Docs drawn from the target (en) vocabulary must average a
    positive log importance weight (more target-like than the corpus
    mixture) and land in the keep-set; docs from a disjoint vocabulary
    must score negative and be excluded."""
    out = tmp_path / "sf"
    out.mkdir()
    en = [(i, "en", " ".join(f"en{j}" for j in range(12))) for i in range(10)]
    de = [(100 + i, "de", " ".join(f"de{j}" for j in range(12))) for i in range(10)]
    spark.createDataFrame(
        en + de, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    rows = {r["lang"]: r for r in textstats.q_dsir_weights(spark, str(out)).collect()}
    assert rows["en"]["avg_logweight"] > 0 > rows["de"]["avg_logweight"]
    assert rows["en"]["n_positive"] == 10
    assert rows["de"]["n_positive"] == 0


def test_bpe_merges_greedy_and_ranked(spark, tmp_path):
    """Hand-computable corpus: 'aaa' words exercise the greedy
    left-to-right overlap rule ('a a a' merges to 'aa a', NOT 'aa aa'),
    'bc' words interleave by count so the ranking alternates between
    merge families across iterations."""
    out = tmp_path / "sf"
    out.mkdir()
    rows = [(1, "en", "aaa aaa"), (2, "en", "bc bc bc")]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    got = [
        (r["step"], r["pair"], r["merged"], r["pair_count"])
        for r in textstats.q_bpe_merges(spark, str(out))
        .orderBy("step")
        .collect()
    ]
    # step1: (a,a) counted WITH overlap = 2 per 'aaa' word -> 4, beats (b,c)=3
    # step2: 'aaa'->'aa a' leaves (aa,a)=2, so (b,c)=3 wins
    # step3: only (aa,a)=2 remains
    assert got == [
        (1, "a a", "aa", 4),
        (2, "b c", "bc", 3),
        (3, "aa a", "aaa", 2),
    ]


def test_bpe_merges_quote_in_pair(spark, tmp_path):
    """A learned pair containing an apostrophe must be applied
    verbatim (the pattern travels as column literals, not interpolated
    SQL — a quote used to corrupt the merge pattern), and both engines
    must agree on it."""
    import duckdb

    out = tmp_path / "sf"
    out.mkdir()
    rows = [(i, "en", "a'b") for i in range(10)]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    got = [
        (r["step"], r["pair"], r["merged"], r["pair_count"])
        for r in textstats.q_bpe_merges(spark, str(out)).orderBy("step").collect()
    ]
    # chars a ' b -> pairs (a,') and (',b) both x10; tiebreak picks
    # "' b" (apostrophe sorts before 'a'); applying it must yield
    # "a 'b" so step 2 can learn (a,'b); then nothing remains
    assert got == [(1, "' b", "'b", 10), (2, "a 'b", "a'b", 10)]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{out}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(
        textstats.EXTRA_ORACLES["bpe_merges"] + " ORDER BY step"
    ).fetchall()
    assert [tuple(r) for r in oracle] == got


def test_frequent_ngrams_planted_heavy_hitter(spark, tmp_path):
    """A trigram planted far above the N/FH_CAP threshold must top the
    report with its EXACT count; background docs of unique tokens
    contribute no qualifying rows."""
    out = tmp_path / "sf"
    out.mkdir()
    boiler = "subscribe to newsletter"
    rows = [(i, f"{boiler} extra{i}") for i in range(40)]  # 40x trigram
    rows += [
        (100 + i, " ".join(f"u{i}w{j}" for j in range(6))) for i in range(30)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(out / "documents.parquet"))
    got = textstats.q_frequent_ngrams(spark, str(out)).collect()
    assert got, "planted heavy hitter missing"
    top = got[0]
    assert top["s"] == boiler and top["freq"] == 40
    # every reported row honors the exact threshold
    for r in got:
        assert r["freq"] > r["total_ngrams"] / textstats.FH_CAP


def test_frequent_ngrams_partition_invariant(spark, tmp_path, monkeypatch):
    """The report set is exact counts over the threshold — the
    survival guarantee makes it identical under any input layout, even
    though the intermediate candidate set is partition-dependent."""
    out = tmp_path / "sf"
    out.mkdir()
    rows = [(i, f"alpha beta gamma tail{i % 7}") for i in range(50)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(out / "documents.parquet"))
    base = [
        (r["s"], r["freq"])
        for r in textstats.q_frequent_ngrams(spark, str(out)).collect()
    ]
    orig_load = textstats.load

    def reload(s, d, name):
        df = orig_load(s, d, name)
        return df.repartition(11) if name == "documents" else df

    monkeypatch.setattr(textstats, "load", reload)
    alt = [
        (r["s"], r["freq"])
        for r in textstats.q_frequent_ngrams(spark, str(out)).collect()
    ]
    assert alt == base and ("alpha beta gamma", 50) in base


def test_curation_pipeline_funnel_monotone(spark):
    """Per-language survivor counts must shrink (weakly) through every
    stage, shares must sum to ≤ 1e6 ppm, and the final token sum must
    equal the per-language tokens_final sum."""
    rows = textstats.q_curation_pipeline(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert (
            r["n_raw"]
            >= r["n_quality"]
            >= r["n_exact_dedup"]
            >= r["n_near_dedup"]
            >= r["n_final"]
            >= 0
        )
    assert sum(r["share_ppm"] for r in rows) <= textstats.CPIPE_PPM


def test_curation_pipeline_planted_stages(spark, tmp_path):
    """Planted docs must fall at the intended stage: an exact duplicate
    dies at exact-dedup, and a benchmark twin dies at decontamination."""
    out = tmp_path / "sf"
    out.mkdir()
    good = (
        "the quick brown fox jumps over the lazy dog and then walks to "
        "the old market with a friend of the family to buy fresh bread"
    )
    rows = [
        (1, "en", good),
        (2, "en", good),  # exact duplicate of 1 → dies at exact dedup
        # doc_id 97 % 97 == 0 → benchmark doc (leaves the training split);
        # stopword-rich so it clears the quality gate first
        (97, "en", "the answer to the contest is this very exact special phrase in the end"),
        # shares the 4-token shingle "this very exact special" with the
        # benchmark doc → decontaminated
        (5, "en", "we keep this very exact special run of the data in the training set"),
    ]
    spark.createDataFrame(rows, "doc_id long, lang string, text string").coalesce(
        1
    ).write.parquet(str(out / "documents.parquet"))
    r = {x["lang"]: x for x in textstats.q_curation_pipeline(spark, str(out)).collect()}[
        "en"
    ]
    assert r["n_raw"] == 4
    # quality gate: all four planted docs are stopword-rich enough to pass
    assert r["n_quality"] == 4
    assert r["n_exact_dedup"] == 3  # the exact duplicate died
    # near-dup banding keeps all three distinct texts
    assert r["n_near_dedup"] == 3
    # bench doc 97 leaves the split; doc 5 is decontaminated → only doc 1
    assert r["n_final"] == 1


def test_curation_pipeline_partition_invariant(spark, monkeypatch):
    """Every stage flag is deterministic under input layout: the content-
    hash window orders by doc_id, bucket mins are layout-free, and the
    loser sets are exact — so the whole funnel must be bit-identical
    after a repartition."""
    sf = "/root/testdata/sf0.001"
    base = sorted(
        tuple(r) for r in textstats.q_curation_pipeline(spark, sf).collect()
    )
    orig_load = textstats.load

    def reload(s, d, name):
        df = orig_load(s, d, name)
        return df.repartition(13) if name == "documents" else df

    monkeypatch.setattr(textstats, "load", reload)
    alt = sorted(
        tuple(r) for r in textstats.q_curation_pipeline(spark, sf).collect()
    )
    assert alt == base


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """Schleimer et al.'s core guarantee: two documents sharing a token
    run of length >= w + k - 1 (= 6 here) must share at least one
    fingerprint; a doc from a disjoint vocabulary shares none. Also pins
    the density bound direction (fingerprints <= k-grams) and the
    short-doc edge (fewer than k tokens -> zero grams, no crash)."""
    out = tmp_path / "sf"
    out.mkdir()
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    rows = [
        (1, "en", f"one two {shared} three four"),
        (2, "en", f"{shared} five six seven eight nine"),
        (3, "en", "p q r s t u v w x y z"),
        (4, "en", "xy zz"),  # < k tokens: no k-grams
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in textstats.q_winnowing_fingerprints(spark, str(out)).collect()
    }
    assert got[1]["n_shared"] >= 1 and got[2]["n_shared"] >= 1
    assert got[3]["n_shared"] == 0
    assert got[4]["n_kgrams"] == 0 and got[4]["n_fingerprints"] == 0
    for d in (1, 2, 3):
        assert 1 <= got[d]["n_fingerprints"] <= got[d]["n_kgrams"]


def test_bm25_ranks_tf_and_length(spark, tmp_path):
    """Hand-checkable BM25 ordering: with equal doc lengths, more query-
    term hits rank higher; a doc with zero query terms is absent from
    the result entirely."""
    out = tmp_path / "sf"
    out.mkdir()
    filler = "x y z p q r"
    rows = [
        (1, "en", "spark spark merge " + filler),   # 3 hits
        (2, "en", "spark a b c " + filler + " d e"),  # 1 hit, longer
        (3, "en", "no query words here at all " + filler),
    ]
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    got = textstats.q_bm25_retrieval(spark, str(out)).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1  # most hits wins
    assert 3 not in ids  # no matching term, no score
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    assert all(got[i]["score"] >= got[i + 1]["score"] for i in range(len(got) - 1))


def test_rrf_fusion_combines_arms(spark, tmp_path):
    """A doc found by BOTH arms must outrank docs each arm ranks first
    alone (1/61 + 1/63 > 1/61), and the 0 sentinel marks out-of-pool
    arm ranks. vec 0 is the fixed query embedding (QUERY_VEC_ID)."""
    out = tmp_path / "sf"
    out.mkdir()
    docs = [
        (0, "en", "no lexical hits here p q r"),
        (1, "en", "spark merge window scan spark merge p q"),
        (2, "en", "also zero hits s t u v w x"),
    ]
    spark.createDataFrame(
        docs, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    vecs = [
        (0, [1.0, 0.0], 0),  # query vector
        (1, [0.0, 1.0], 0),  # orthogonal: last semantic rank
        (2, [1.0, 0.0], 0),  # cos 1 with the query
    ]
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.parquet(str(out / "embeddings.parquet"))
    got = {
        r["doc_id"]: r
        for r in textstats.q_rrf_hybrid_retrieval(spark, str(out)).collect()
    }
    assert got[1]["rank"] == 1  # lex #1 + sem #3 beats any single arm
    assert got[1]["lex_rank"] == 1 and got[1]["sem_rank"] == 3
    assert got[0]["lex_rank"] == 0 and got[2]["lex_rank"] == 0  # sentinel
    assert got[0]["sem_rank"] == 1  # self-similarity; tie broken by id
    assert got[2]["sem_rank"] == 2


def test_ks_drift_flags_planted_source(spark, tmp_path):
    """Sources A and B share an identical length distribution (D small,
    under the critical value); source C sits on a disjoint length range
    (D = 1) and must be the only one flagged."""
    out = tmp_path / "sf"
    out.mkdir()
    rows = (
        [(i, "A", 10 + i % 40) for i in range(40)]
        + [(100 + i, "B", 10 + i % 40) for i in range(40)]
        + [(200 + i, "C", 1000 + i) for i in range(10)]
    )
    spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    got = {r["source"]: r for r in textstats.q_ks_drift(spark, str(out)).collect()}
    assert got["C"]["drifted"] == 1 and got["C"]["ks_stat"] == 1.0
    assert got["A"]["drifted"] == 0 and got["B"]["drifted"] == 0
    for r in got.values():
        assert r["ks_stat"] <= 1.0 and r["critical_value"] > 0


def test_ccnet_buckets_are_thirds_ordered_by_ppl(spark, tmp_path):
    """Per lang: ntile thirds differ by at most one doc, and the head
    bucket's mean logprob is >= the tail's (lower perplexity = head)."""
    out = tmp_path / "sf"
    out.mkdir()
    words = ["alpha", "beta", "gamma", "delta"]
    rows = []
    for i in range(21):
        # doc i repeats word i%4: common words ('alpha' docs get boosted
        # corpus frequency) produce higher mean logprob
        rows.append((i, "en", " ".join([words[i % 4]] * (3 + i % 5))))
    for i in range(8):
        rows.append((100 + i, "de", " ".join(words[: 1 + i % 3])))
    spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).coalesce(1).write.parquet(str(out / "documents.parquet"))
    got = textstats.q_ccnet_ppl_buckets(spark, str(out)).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], {})[r["bucket"]] = r
    for lang, buckets in by_lang.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        sizes = [r["n_docs"] for r in buckets.values()]
        assert max(sizes) - min(sizes) <= 1  # ntile thirds
        if "head" in buckets and "tail" in buckets:
            assert buckets["head"]["avg_logprob"] >= buckets["tail"]["avg_logprob"]
            assert buckets["head"]["avg_ppl"] <= buckets["tail"]["avg_ppl"]


def test_domain_cap_keeps_global_top_cap_per_source(spark, tmp_path):
    """The two-stage (salted) top-k must equal the single global top-cap
    per source: n_kept = min(n_docs, cap), and the kept set's priority
    extremes match a driver-side md5 sort."""
    import hashlib

    out = tmp_path / "sf"
    out.mkdir()
    rows = [(i, "big") for i in range(50)] + [(1000 + i, "small") for i in range(5)]
    spark.createDataFrame(rows, "doc_id long, source string").coalesce(
        1
    ).write.parquet(str(out / "documents.parquet"))
    got = {
        r["source"]: r
        for r in textstats.q_domain_cap_sample(spark, str(out)).collect()
    }
    assert got["big"]["n_docs"] == 50 and got["big"]["n_kept"] == textstats.DOMAIN_CAP
    assert got["small"]["n_docs"] == 5 and got["small"]["n_kept"] == 5
    pris = sorted(hashlib.md5(str(i).encode()).hexdigest() for i in range(50))
    kept = pris[: textstats.DOMAIN_CAP]
    assert got["big"]["min_pri"] == kept[0]
    assert got["big"]["max_pri"] == kept[-1]
