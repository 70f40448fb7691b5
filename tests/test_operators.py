"""Behavioral tests for training-data operators (dedup, similarity,
text stats, multimodal, streaming) — value-level checks with injected
duplicates/neighbors, complementing the DuckDB-oracle contract checks
(scripts/check_contract.py) which pin engine parity."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.spark


@pytest.fixture(scope="session")
def spark():
    from xhtmlkit_spark.session import get_spark

    return get_spark("local[2]", shuffle_partitions=4, app_name="op-tests")


@pytest.fixture(scope="session")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (4, "completely different content about spark shuffle partitions"),
        (5, "Spark   shuffle  partitions matter a lot  "),  # ws-normalized distinct
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bind_equivalence_and_single_evaluation(spark):
    """bind(col, body) must equal the direct (captured) expression for
    every input shape — null, empty, normal — while evaluating col once."""
    from pyspark.sql import functions as F

    from xhtmlkit_spark.functions.binding import bind

    df = spark.createDataFrame(
        [(None,), ("",), ("a b c",), ("  x  ",), ("one two three four five",)],
        "text string",
    )
    toks = F.split(F.trim("text"), "\\s+")
    direct = F.concat_ws("|", F.transform(toks, lambda t: F.upper(t)))
    bound = bind(toks, lambda t: F.concat_ws("|", F.transform(t, lambda x: F.upper(x))))
    rows = df.select(direct.alias("d"), bound.alias("b")).collect()
    assert all(r["d"] == r["b"] for r in rows), rows
    # nested bind + struct field access
    nested = bind(
        F.struct(toks.alias("t"), F.size(toks).alias("n")),
        lambda p: bind(p["t"], lambda t: F.size(t) == p["n"]),
    )
    assert all(r[0] in (True, None) for r in df.select(nested).collect())


def test_derive_part_matches_datagen(spark):
    """pipeline.derive_part (Spark crc32) must reproduce datagen.doc_part
    (zlib.crc32) exactly — resume-by-part silently corrupts otherwise."""
    from xhtmlkit_spark.datagen import doc_part
    from xhtmlkit_spark.plans.pipeline import derive_part

    ids = [f"d{i:012d}" for i in range(50)] + ["", "héllo", "a/b|c", "中文id"]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id string")
    got = {r["doc_id"]: r["part"] for r in derive_part(df, n_parts=16).collect()}
    assert got == {i: doc_part(i, 16) for i in ids}


def test_exact_dedup_groups(docs):
    from xhtmlkit_spark.operators.dedup import exact_dup_groups

    out = {r["keep_id"]: r["n_copies"] for r in exact_dup_groups(docs).collect()}
    assert out[1] == 2  # docs 1+2 collapse
    assert out[3] == 1 and out[4] == 1 and out[5] == 1


def test_lsh_finds_near_duplicate(docs):
    from xhtmlkit_spark.operators.dedup import jaccard_verify, lsh_candidate_pairs

    pairs = lsh_candidate_pairs(docs, n_hashes=8, band_size=2, k=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup always collides
    assert (1, 3) in got or (2, 3) in got  # near dup shares most bigrams
    j = {(r["id_a"], r["id_b"]): r["jaccard_u"] for r in jaccard_verify(pairs, docs, k=2).collect()}
    assert j[(1, 2)] == 1_000_000
    if (1, 3) in j:
        assert 500_000 < j[(1, 3)] < 1_000_000


def test_connected_components_planted_chain(spark):
    from xhtmlkit_spark.operators.dedup import connected_components, near_dup_groups

    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "id long")
    # chain A~B, B~C with NO direct A~C edge: transitive closure must
    # still put all three in one group; 4~5 a separate pair; 6 singleton
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "id_a long, id_b long")
    got = {r["id"]: r["group_id"] for r in connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}
    # empty pair set → every doc is its own group
    empty = spark.createDataFrame([], "id_a long, id_b long")
    docs = nodes.withColumnRenamed("id", "doc_id")
    got2 = {r["doc_id"]: r["group_id"] for r in near_dup_groups(docs, empty).collect()}
    assert got2 == {i: i for i in range(1, 7)}


def test_simhash_properties(spark, docs):
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.dedup import simhash_col

    out = {r["doc_id"]: r["sh"] for r in docs.select("doc_id", simhash_col("text").alias("sh")).collect()}
    assert out[1] == out[2]  # identical text → identical simhash
    ham_near = bin(out[1] ^ out[3]).count("1")
    ham_far = bin(out[1] ^ out[4]).count("1")
    assert ham_near < ham_far  # near-dup closer in hamming space


def test_lsh_null_docs_never_pair(spark):
    from xhtmlkit_spark.operators.dedup import lsh_candidate_pairs

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "shared text content here"), (4, "shared text content here")],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(df, text="text", n_hashes=4, band_size=2, k=2).collect()
    }
    # NULL text yields NULL shingles/signature → never a candidate
    # (concat_ws semantics would otherwise bucket ALL null docs together)
    assert (1, 2) not in pairs
    assert (3, 4) in pairs


def test_simhash_band_pairs_pigeonhole(spark, docs):
    from xhtmlkit_spark.operators.dedup import simhash_band_pairs

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_band_pairs(
            docs, id_col="doc_id", n_bands=6, max_hamming=5
        ).collect()
    }
    # identical text → hamming 0, must ALWAYS be found (pigeonhole
    # guarantees recall for hamming < n_bands)
    assert got[(1, 2)] == 0
    # every reported pair satisfies the threshold
    assert all(h <= 5 for h in got.values())


def test_fingerprints_normalization(spark):
    from xhtmlkit_spark.operators.text_stats import with_fingerprints

    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "hello worlds")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["fp_md5"], r["fp_roll"]) for r in with_fingerprints(df).collect()}
    assert out[1][0] == out[2][0]  # case+ws normalized md5 equal
    assert out[1][0] != out[3][0]
    assert out[1][1] != out[3][1]  # rolling hash separates


def test_lang_guess_stopwords(spark):
    from xhtmlkit_spark.operators.text_stats import with_lang_guess

    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "der hund ist nicht in der schule und das ist gut"),
            (3, "le chat est dans la maison et il est un ami"),
            (4, "这是 中文 文本"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_guess"] for r in with_lang_guess(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "zh"}


def test_brute_force_topk_finds_planted_neighbor(spark):
    import random

    from xhtmlkit_spark.operators.similarity import brute_force_topk

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [v + rng.gauss(0, 0.01) for v in base]
    rows = [(0, base), (1, near)] + [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(2, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = brute_force_topk(df, df.where("vec_id = 0"), k=3).collect()
    assert out[0]["neighbor_id"] == 1 and out[0]["cos_sim"] > 0.99


def test_hyperplane_neardup_finds_planted_neighbor(spark):
    import random

    from xhtmlkit_spark.operators.similarity import hyperplane_neardup_pairs

    rng = random.Random(11)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [v + rng.gauss(0, 0.005) for v in base]  # cos ≈ 0.9999
    rows = [(0, base), (1, near), (2, None)] + [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(3, 40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = hyperplane_neardup_pairs(df, threshold=0.9)
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out.collect()}
    # a true near-dup projects to the same sign on every plane of at
    # least one set (perturbation ≪ any projection margin here), so the
    # bucket join must surface it
    assert (0, 1) in got and got[(0, 1)] > 0.99
    # the whole point of the re-route: candidates meet via bucket
    # EQUI-joins, never a nested-loop over the cross product
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_connected_components_pair_only_ids(spark):
    """Pair endpoints absent from `nodes` are nodes too: without
    self-labels they'd carry NULL old-labels, never count as changed,
    and stall propagation one hop early (review finding)."""
    from xhtmlkit_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(1,)], "id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    got = {r["id"]: r["group_id"] for r in connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_run_available_now_guard_ignores_column_names(spark, tmp_path):
    import datetime

    import pytest as _pytest

    from xhtmlkit_spark.streaming.jobs import read_events_stream, run_available_now

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tmp_path / "sfG"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    # a column literally named "AggregatedValue" must not defeat the
    # row-stream refusal (the guard matches node names, not substrings)
    from pyspark.sql import functions as F

    row_stream = read_events_stream(spark, str(d)).select(
        F.col("value").alias("AggregatedValue")
    )
    with _pytest.raises(ValueError, match="row-shaped"):
        run_available_now(row_stream)


def test_user_sessions_microsecond_boundary(spark, tmp_path):
    """Gap of 1800.2s must start a new session (interval arithmetic,
    not truncated epoch seconds — review finding)."""
    import datetime

    import __spark_entry__ as entry

    base = datetime.datetime(2024, 1, 1, 12, 0, 0, 700000)
    rows = [
        (1, base, 7, "click", 1.0, "{}"),
        (2, base + datetime.timedelta(seconds=1800, microseconds=200000), 7, "click", 1.0, "{}"),
        (3, base + datetime.timedelta(seconds=1800, microseconds=100000), 8, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string"
    )
    d = tmp_path / "sfS"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    out = entry.queries()["user_sessions"](spark, str(d)).collect()
    n_sessions = {7: 0, 8: 0}
    for r in out:
        n_sessions[r["user_id"]] += 1
    # user 7: gap 1800.2s > 30min → two sessions; user 8 has one event
    assert n_sessions == {7: 2, 8: 1}


def test_kmeans_ivf_separates_planted_clusters(spark):
    import random

    from xhtmlkit_spark.operators.similarity import ivf_ann_topk, kmeans_centroids

    rng = random.Random(31)
    # three tight clusters around orthogonal-ish directions
    axes = [[rng.gauss(0, 1) for _ in range(64)] for _ in range(3)]
    rows = []
    vid = 0
    for a in axes:
        for _ in range(20):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in a]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = kmeans_centroids(df, n_cells=3, iters=5, sample_rows=60)
    assert len(cents) == 3 and all(abs(sum(x * x for x in c) - 1) < 1e-9 for c in cents)
    # deterministic: same sample → same centroids
    assert cents == kmeans_centroids(df, n_cells=3, iters=5, sample_rows=60)
    out = ivf_ann_topk(df, k=1, n_cells=3, nprobe=1, centroids=cents).collect()
    # with learned cells, every vector's nearest neighbor lives in its
    # own cluster — all top-1 neighbors come from the same 20-vector block
    assert all(r["query_id"] // 20 == r["neighbor_id"] // 20 for r in out)
    assert len(out) == 60


def test_hash_sampling_deterministic_and_nested(spark):
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.sampling import hash_sample, stratified_sample

    df = spark.createDataFrame(
        [(i, ["en", "de", "fr"][i % 3]) for i in range(300)], "doc_id long, lang string"
    )
    ids = lambda d: {r["doc_id"] for r in d.select("doc_id").collect()}
    # partitioning-independent (df.sample is NOT): same rows at any layout
    a = ids(hash_sample(df.repartition(2), 0.3))
    b = ids(hash_sample(df.repartition(16), 0.3))
    assert a == b and 0 < len(a) < 300
    # nested: same salt, smaller rate is a subset
    assert ids(hash_sample(df, 0.1)) <= a
    # independent: different salt gives a different selection
    assert ids(hash_sample(df, 0.3, salt="s1")) != a
    # stratified: de kept fully, absent stratum dropped via default 0
    s = stratified_sample(df, {"de": 1.0, "en": 0.5}, default_rate=0.0)
    by_lang = {
        r["lang"]: r["n"]
        for r in s.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert by_lang.get("de") == 100 and "fr" not in by_lang
    assert 0 < by_lang.get("en", 0) < 100


def test_quality_ensemble_separates_planted_docs(spark):
    """The multi-signal score must rank a clean prose doc above a
    pathologically repetitive one, with the exact integer micro-unit
    value matching a hand computation of the frozen formula."""
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.text_stats import quality_ensemble

    rows = [
        (1, "the quick brown fox jumps over a lazy dog and it runs to the "
            "river for a drink of cold water in the morning light"),
        (2, "! " * 80),  # repeated punctuation junk: repetition AND quality fail
        (3, None),  # no signals → absent
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in quality_ensemble(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["ensemble_u"] > out[2]["ensemble_u"]
    assert out[1]["keep"] and not out[2]["keep"]
    # hand-check the integer composition for doc 1
    r1 = out[1]
    q4 = r1["quality_score_u"]
    d6 = r1["dup_token_ratio_u"]
    n6 = r1["mean_nll_u"]
    expect = (
        q4 * 2400
        + (1_000_000 - min(d6 * 2, 1_000_000)) * 18
        + (6_000_000 - min(max(n6 - 2_000_000, 0), 6_000_000)) * 3
    )
    assert r1["ensemble_u"] == expect


def test_approx_distinct_error_bound(spark):
    """The HLL sketch (B12, rows-only in the oracle gate — no cross-
    engine twin exists) is still pinned HERE: approx_count_distinct at
    the default rsd=0.05 must land within 3 standard deviations (15%)
    of the exact count on a 40k-distinct column."""
    from pyspark.sql import functions as F

    df = spark.range(200_000).select(
        (F.col("id") % 40_000).alias("uid"), (F.col("id") % 4).alias("g")
    )
    rows = df.groupBy("g").agg(
        F.approx_count_distinct("uid").alias("approx"),
        F.countDistinct("uid").alias("exact"),
    ).collect()
    assert len(rows) == 4
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.15, dict(r.asDict())


def test_temperature_mix_flattens_skew(spark):
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.sampling import temperature_mix

    # 500 'big' docs vs 20 'small' docs: α=0.5 must upweight 'small'
    df = spark.createDataFrame(
        [(i, "big" if i < 500 else "small") for i in range(520)],
        "doc_id long, source string",
    )
    out = temperature_mix(df, stratum="source", target_frac=0.5)
    rates = {
        r["source"]: r["mix_rate_u"]
        for r in out.select("source", "mix_rate_u").distinct().collect()
    }
    # small stratum: sqrt(20)/(sqrt(500)+sqrt(20)) * 260 / 20 > 1 → clamped
    assert rates["small"] == 1_000_000 and 0 < rates["big"] < 1_000_000
    counts = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["small"] == 20  # kept whole
    # sampled share of 'small' strictly exceeds its corpus share
    assert counts["small"] / sum(counts.values()) > 20 / 520
    # deterministic across partitioning
    ids = lambda d: {r["doc_id"] for r in d.select("doc_id").collect()}
    assert ids(temperature_mix(df.repartition(13), stratum="source")) == ids(out)


def test_pagerank_matches_reimplementation(spark):
    """Fixed-iteration PageRank equals an independent power iteration
    bit-for-bit (same recurrence order), conserves probability mass
    every run, and handles dangling + isolated nodes."""
    from xhtmlkit_spark.operators.graph import pagerank

    # 0->1, 0->2, 1->2, 2->0, 3->0 dangling? no: 3 has an out-edge;
    # make 3 dangling (no out), 4 isolated (no edges at all)
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 0), (2, 0)],  # duplicate edge dedupes
        "src long, dst long",
    )
    res = {r["id"]: r["rank"] for r in pagerank(nodes, edges, n_iter=8).collect()}

    N, d = 5, 0.85
    out = {0: [1, 2], 1: [2], 2: [0]}
    r = {i: 1 / N for i in range(N)}
    for _ in range(8):
        contrib = {i: 0.0 for i in range(N)}
        for u, vs in out.items():
            for v in vs:
                contrib[v] += r[u] / len(vs)
        dang = sum(r[u] for u in range(N) if u not in out)
        r = {i: (1 - d) / N + d * (contrib[i] + dang / N) for i in range(N)}
    assert set(res) == set(r)
    for i in range(N):
        assert abs(res[i] - r[i]) < 1e-12
    assert abs(sum(res.values()) - 1.0) < 1e-9  # mass conserved
    assert res[3] == res[4]  # dangling and isolated: same (no in-links)
    assert res[0] > res[1]  # 0 has the heavy in-link (from 2)
    # edge endpoints absent from nodes are added
    res2 = {
        r2["id"]: r2["rank"]
        for r2 in pagerank(
            spark.createDataFrame([(0,)], "id long"),
            spark.createDataFrame([(0, 9)], "src long, dst long"),
            n_iter=2,
        ).collect()
    }
    assert set(res2) == {0, 9} and res2[9] > res2[0]
    # empty graph: empty frame, not ZeroDivisionError
    empty = spark.createDataFrame([], "id long")
    assert pagerank(empty, spark.createDataFrame([], "src long, dst long")).count() == 0


def test_snapshot_diff_semantics(spark):
    """added/removed/changed classification, unchanged dropped, and
    NULL digests compared null-safely (presence ≠ digest nullability)."""
    from xhtmlkit_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [("a", "d1"), ("b", "d2"), ("c", "d3"), ("n1", None), ("n2", None)],
        "url string, digest string",
    )
    new = spark.createDataFrame(
        [("b", "d2"), ("c", "dX"), ("d", "d4"), ("n1", None), ("n2", "dY")],
        "url string, digest string",
    )
    out = {r["url"]: r for r in snapshot_diff(old, new).collect()}
    # a removed; b unchanged (dropped); c changed; d added;
    # n1 NULL==NULL unchanged (dropped); n2 NULL→dY changed
    assert {u: r["change"] for u, r in out.items()} == {
        "a": "removed", "c": "changed", "d": "added", "n2": "changed",
    }
    assert out["c"]["old_digest"] == "d3" and out["c"]["new_digest"] == "dX"
    assert out["d"]["old_digest"] is None and out["d"]["new_digest"] == "d4"
    assert out["n2"]["old_digest"] is None and out["n2"]["new_digest"] == "dY"


def test_surt_key_matches_python_twin(spark):
    """The JVM surt_key projection and the python xkit.warc.surt (used
    inside warc_cdx) must agree — they are two implementations of one
    index-key convention."""
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.urls import surt_key
    from xkit.warc import surt

    urls = [
        "https://WWW.Example.COM:443/a/b?z=1&a=2#frag",
        "http://user:pw@sub.example.org:80",
        "http://example.com/path",
        "http://example.com",
        "https://example.com/p",
        "http://www.example.com/p",
        "http://ex.io:8080/x?b=2&a=1&ref=r",
        "ftp://Example.com/F/Ile",
        "https://a.b.c.example.co.uk/x?q=",
        "http://h.example/?&&z=9&y=8",
        "not a url 7",
        "mailto:someone@example.com",
        "http://a@b@c.example/p",  # multi-@: both twins strip at the FIRST @
    ] + [f"http://site{i % 7}.example/p/{i}?k{i % 3}={i}&utm_source=s{i}" for i in range(40)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {r["url"]: r["urlkey"] for r in df.select("url", surt_key("url").alias("urlkey")).collect()}
    for u in urls:
        assert got[u] == surt(u), (u, got[u], surt(u))


def test_dsir_weights_matches_reimplementation(spark):
    """DSIR hashed-ngram importance weights equal an independent
    pure-Python reimplementation, target-like raw docs outrank junk,
    and the result is partitioning-invariant."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.sampling import dsir_weights

    rows = [
        ("t1", True, "the cat sat on the mat"),
        ("t2", True, "the cat ran home"),
        ("r1", False, "the cat sat"),
        ("r2", False, "quantum flux capacitor overload"),
        ("r3", False, "x"),
        ("r4", False, None),
        ("r5", False, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tgt boolean, text string")
    out = dsir_weights(df, F.col("tgt"), n_buckets=64)
    res = {r["doc_id"]: (r["n_feats"], r["log_weight_u"]) for r in out.collect()}

    K = 64

    def feats(s):
        toks = s.lower().split()
        bi = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        return [t for t in toks if t] + bi

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:6], 16) % K

    tk: dict = {}
    rk: dict = {}
    for _, tgt, txt in rows:
        if txt is None:
            continue
        for f in feats(txt):
            d = tk if tgt else rk
            d[bucket(f)] = d.get(bucket(f), 0) + 1
    T, R = sum(tk.values()), sum(rk.values())

    def ratio_micro(b):  # the per-BUCKET micro-quantized log ratio
        x = 1e6 * (
            math.log((tk.get(b, 0) + 1) / (T + K))
            - math.log((rk.get(b, 0) + 1) / (R + K))
        )
        return int(math.copysign(math.floor(abs(x) + 0.5), x))  # half away

    exp = {}
    for did, tgt, txt in rows:
        if tgt or txt is None or not feats(txt):
            continue
        lw_u = sum(ratio_micro(bucket(f)) for f in feats(txt))
        exp[did] = (len(feats(txt)), lw_u)
    assert set(res) == set(exp)  # null/empty docs absent, targets absent
    for k in exp:
        assert res[k] == exp[k]  # EXACT integers now (exactmath)
    assert res["r1"][1] > res["r2"][1]  # target-like beats junk
    rep = {
        r["doc_id"]: (r["n_feats"], r["log_weight_u"])
        for r in dsir_weights(df.repartition(7), F.col("tgt"), n_buckets=64).collect()
    }
    assert rep == res


def test_token_windows_coverage_and_overlap(spark):
    from xhtmlkit_spark.operators.text_stats import token_windows

    rows = [
        (1, " ".join(f"t{i}" for i in range(50))),  # 2 windows: [0..31],[24..49]
        (2, "a b c"),  # shorter than one window → exactly 1
        (3, None),
        (4, "   "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = token_windows(df, window=32, stride=24).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {1, 2}
    w1 = sorted(by_doc[1], key=lambda r: r["win_idx"])
    assert [r["n_win_tokens"] for r in w1] == [32, 26]
    assert [r["win_idx"] for r in w1] == [0, 1]
    assert by_doc[2][0]["n_win_tokens"] == 3
    # window hashes match the definition (md5 of the joined token slice)
    import hashlib

    toks = [f"t{i}" for i in range(50)]
    assert w1[1]["win_md5"] == hashlib.md5(" ".join(toks[24:50]).encode()).hexdigest()


def test_ivf_persisted_index_matches_inmemory_and_prunes(spark, tmp_path):
    """build_ivf_index + ivf_query_topk (the production index-once/
    query-many split) must return exactly what the in-memory
    ivf_ann_topk computes for the same centroids, and the cells scan
    must be partition-PRUNED to the probed inverted lists."""
    import random

    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.similarity import (
        build_ivf_index,
        ivf_ann_topk,
        ivf_centroids,
        ivf_query_topk,
    )

    rng = random.Random(41)
    rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(200)]
    rows += [(200, None), (201, [0.0] * 32)]  # dropped at build
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = ivf_centroids(8, 32)

    stats = build_ivf_index(
        df, str(tmp_path / "ivf"), n_cells=8, dim=32, centroids=cents
    )
    assert stats["n_vectors"] == 200 and stats["n_cells"] == 8

    queries = df.where(F.col("vec_id") < 10)
    got = ivf_query_topk(
        spark, str(tmp_path / "ivf"), queries, k=3, nprobe=2
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan  # pruned scan
    got_rows = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cos_sim"])
        for r in got.collect()
    }
    # reference: the in-memory operator, restricted to the query ids
    ref = ivf_ann_topk(df, k=3, n_cells=8, nprobe=2, dim=32, centroids=cents)
    ref_rows = {
        (r["query_id"], r["rnk"]): (r["neighbor_id"], r["cos_sim"])
        for r in ref.where(F.col("query_id") < 10).collect()
    }
    assert got_rows == ref_rows and len(got_rows) == 30


def test_ivf_topk_finds_planted_neighbor(spark):
    import random

    from xhtmlkit_spark.operators.similarity import ivf_ann_topk

    rng = random.Random(23)
    base = [rng.gauss(0, 1) for _ in range(64)]
    near = [v + rng.gauss(0, 0.005) for v in base]  # cos ≈ 0.9999
    rows = [(0, base), (1, near), (2, None)] + [
        (i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(3, 60)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivf_ann_topk(df, k=3, n_cells=8, nprobe=2)
    got = {
        r["query_id"]: r["neighbor_id"] for r in out.collect() if r["rnk"] == 1
    }
    # a near-identical vector quantizes to the same best cell (the
    # perturbation is far below any cell-boundary margin here), so the
    # inverted-list join must rank it first for its twin
    assert got[0] == 1 and got[1] == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_media_features_deterministic(spark):
    from xhtmlkit_spark.operators.multimodal import (
        media_feature_stage,
        media_table_from_refs,
    )

    refs = spark.createDataFrame(
        [("s3://m/a.jpg",), ("s3://m/b.mp4",), ("s3://m/a.jpg",)], "media_ref string"
    )
    media = media_table_from_refs(refs, n_bytes=1024)
    rows = media_feature_stage(media).collect()
    assert len(rows) == 2  # distinct refs
    by_ref = {r["media_ref"]: r for r in rows}
    assert by_ref["s3://m/b.mp4"]["media_type"] == "video"
    # features are rounded to 6 dp, so the sum can drift by ≤ 16×5e-7
    assert abs(sum(by_ref["s3://m/a.jpg"]["features"]) - 1.0) < 1e-4
    # deterministic across invocations
    rows2 = media_feature_stage(media_table_from_refs(refs, n_bytes=1024)).collect()
    assert {r["media_ref"]: r["features"] for r in rows2} == {
        r["media_ref"]: r["features"] for r in rows
    }


def test_frame_sample_fanout_and_determinism(spark):
    from xhtmlkit_spark.operators.multimodal import (
        frame_sample_stage,
        media_table_from_refs,
    )

    refs = spark.createDataFrame(
        [("s3://m/v.mp4",), ("s3://m/a.jpg",), ("s3://m/x.mp3",)], "media_ref string"
    )
    media = media_table_from_refs(refs, n_bytes=2048)
    rows = frame_sample_stage(media, n_frames=4, frame_bytes=128).collect()
    by_ref: dict = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r)
    # video fans out to n_frames, image to one, audio to none
    assert len(by_ref["s3://m/v.mp4"]) == 4
    assert len(by_ref["s3://m/a.jpg"]) == 1
    assert "s3://m/x.mp3" not in by_ref
    vid = sorted(by_ref["s3://m/v.mp4"], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in vid] == [0, 1, 2, 3]
    # evenly spaced, increasing offsets; last frame ends at payload end
    offs = [r["frame_offset"] for r in vid]
    assert offs == sorted(offs) and offs[0] == 0 and offs[-1] == 2048 - 128
    assert all(r["n_frame_bytes"] == 128 for r in vid)
    # deterministic across invocations
    rows2 = frame_sample_stage(
        media_table_from_refs(refs, n_bytes=2048), n_frames=4, frame_bytes=128
    ).collect()
    key = lambda rs: sorted((r["media_ref"], r["frame_idx"], bytes(r["frame"])) for r in rs)
    assert key(rows) == key(rows2)


def test_resize_stage_images_only_and_injectable(spark):
    from xhtmlkit_spark.operators.multimodal import (
        media_table_from_refs,
        resize_stage,
    )

    refs = spark.createDataFrame(
        [("s3://m/a.jpg",), ("s3://m/v.mp4",)], "media_ref string"
    )
    media = media_table_from_refs(refs, n_bytes=4096)
    rows = {r["media_ref"]: r for r in resize_stage(media, target_bytes=512).collect()}
    img, vid = rows["s3://m/a.jpg"], rows["s3://m/v.mp4"]
    # images shrink to exactly the target; non-images pass untouched
    assert img["n_bytes"] == 512 and img["orig_bytes"] == 4096
    assert vid["n_bytes"] == vid["orig_bytes"] == 4096
    # injectable resizer (the prod pillow seam)
    rows2 = resize_stage(
        media, target_bytes=512, resizer=lambda p, t, n: p[:8]
    ).collect()
    assert {r["n_bytes"] for r in rows2 if r["media_type"] == "image"} == {8}
    # deterministic default
    again = {r["media_ref"]: bytes(r["payload"]) for r in resize_stage(media, 512).collect()}
    assert again == {k: bytes(v["payload"]) for k, v in rows.items()}


def test_decode_media_is_marked_stub():
    from xhtmlkit_spark.operators.multimodal import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "image")
    assert decode_media(b"\x00", "image", decoder=lambda p, t: (t, len(p))) == ("image", 1)


def test_stream_dedup_removes_duplicates(spark, tmp_path):
    import datetime

    from xhtmlkit_spark.streaming.jobs import dedup_events_stream

    base = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(20):
        ts = base + datetime.timedelta(minutes=i)
        rows.append((i, ts, i % 3, "click", 1.0, "{}"))
        if i % 4 == 0:  # duplicate event ids injected
            rows.append((i, ts, i % 3, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tmp_path / "sfX"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    out = dedup_events_stream(spark, str(d)).collect()
    assert {r["event_type"]: r["n_events"] for r in out} == {"click": 20}


def test_stream_dedup_empty_source_returns_empty(spark, tmp_path):
    from xhtmlkit_spark.streaming.jobs import dedup_events_stream

    df = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tmp_path / "sfE"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    # zero input files drained → file sink writes nothing; the readback
    # must use the known schema instead of failing inference
    assert dedup_events_stream(spark, str(d)).collect() == []


def test_run_available_now_refuses_row_streams(spark, tmp_path):
    import datetime

    import pytest as _pytest

    from xhtmlkit_spark.streaming.jobs import read_events_stream, run_available_now

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 1, "click", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    d = tmp_path / "sfR"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    row_stream = read_events_stream(spark, str(d)).select("event_id", "value")
    with _pytest.raises(ValueError, match="row-shaped"):
        run_available_now(row_stream)


def test_running_totals_state_accumulates_across_batches(spark, tmp_path):
    import datetime

    from xhtmlkit_spark.streaming.jobs import running_totals_stream

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), i % 3, "click", float(i), "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tmp_path / "sfY"
    d.mkdir()
    # three parquet files + maxFilesPerTrigger=1 → three micro-batches,
    # so the GroupState must carry totals BETWEEN batches to be right
    df.repartition(3).write.parquet(str(d / "events.parquet"))
    out = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in running_totals_stream(spark, str(d), max_files_per_trigger=1).collect()
    }
    expect = {}
    for i in range(30):
        n, s = expect.get(i % 3, (0, 0.0))
        expect[i % 3] = (n + 1, s + float(i))
    assert out == {u: (n, round(s, 2)) for u, (n, s) in expect.items()}


def _protobuf_ok() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


@pytest.mark.skipif(
    not _protobuf_ok(),
    reason="transformWithStateInPandas needs google.protobuf (its state "
    "server speaks protobuf); absent in this container — runs on a "
    "normally-provisioned cluster",
)
def test_user_value_stats_stream_tws(spark, tmp_path):
    import datetime

    from xhtmlkit_spark.streaming.jobs import user_value_stats_stream

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), i % 3, "click", float(i), "{}")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = tmp_path / "sfT"
    d.mkdir()
    df.write.parquet(str(d / "events.parquet"))
    out = {
        r["user_id"]: (r["n_events"], r["sum_value"], r["max_value"])
        for r in user_value_stats_stream(spark, str(d)).collect()
    }
    assert out[0] == (10, sum(range(0, 30, 3)), 27.0)


def test_streaming_extract_matches_batch(spark, tmp_path):
    from xhtmlkit_spark.datagen import generate_corpus
    from xhtmlkit_spark.operators.extract_stage import extract_spans
    from xhtmlkit_spark.streaming.jobs import streaming_extract

    corpus = generate_corpus(str(tmp_path / "corpus"), 60, seed=11, chunk_docs=20)
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    streaming_extract(spark, corpus, out, chk, max_files_per_trigger=1)
    streamed = {
        r["doc_id"]: str(r["spans"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: str(r["spans"])
        for r in extract_spans(spark.read.parquet(corpus)).collect()
    }
    assert streamed == batch
    # exactly-once: draining again with the same checkpoint adds nothing
    streaming_extract(spark, corpus, out, chk, max_files_per_trigger=1)
    assert spark.read.parquet(out).count() == len(batch)


def test_streaming_select_matches_batch(spark, tmp_path):
    """Stateless select stage in-stream (markup emit included):
    micro-batch ≡ batch on the same files, exactly-once on re-drain."""
    from xhtmlkit_spark.datagen import generate_corpus
    from xhtmlkit_spark.operators.select_stage import select_spans
    from xhtmlkit_spark.streaming.jobs import streaming_select

    corpus = generate_corpus(str(tmp_path / "corpus"), 40, seed=13, chunk_docs=20)
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    streaming_select(
        spark, corpus, out, chk, xpath="//table", emit="html",
        max_files_per_trigger=1,
    )
    streamed = {
        r["doc_id"]: str(r["spans"]) for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: str(r["spans"])
        for r in select_spans(
            spark.read.parquet(corpus), xpath="//table", emit="html"
        ).collect()
    }
    assert streamed == batch
    assert any("<table" in v for v in streamed.values())
    # exactly-once: re-drain with the same checkpoint adds nothing
    streaming_select(
        spark, corpus, out, chk, xpath="//table", emit="html",
        max_files_per_trigger=1,
    )
    assert spark.read.parquet(out).count() == len(batch)
    # malformed query fails on the driver, before any stream starts
    with pytest.raises(ValueError):
        streaming_select(spark, corpus, out, chk, xpath="//a/following::b/c")


def test_streaming_project_matches_batch(spark, tmp_path):
    """Fused multi-projection in-stream: micro-batch ≡ batch on the
    same files across BOTH views, exactly-once on re-drain."""
    from xhtmlkit_spark.datagen import generate_corpus
    from xhtmlkit_spark.operators.project_stage import project_docs
    from xhtmlkit_spark.streaming.jobs import streaming_project

    corpus = generate_corpus(str(tmp_path / "corpus"), 40, seed=13, chunk_docs=20)
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    streaming_project(spark, corpus, out, chk, max_files_per_trigger=1)
    streamed = {
        r["doc_id"]: (str(r["spans"]), r["markdown"])
        for r in spark.read.parquet(out).collect()
    }
    batch = {
        r["doc_id"]: (str(r["spans"]), r["markdown"])
        for r in project_docs(spark.read.parquet(corpus)).collect()
    }
    assert streamed == batch
    assert any(md for _, md in streamed.values())
    # exactly-once: re-drain with the same checkpoint adds nothing
    streaming_project(spark, corpus, out, chk, max_files_per_trigger=1)
    assert spark.read.parquet(out).count() == len(batch)


def test_streaming_clean_extract_matches_batch(spark, tmp_path):
    """Stateless cleaning tiers in-stream: micro-batch output must
    equal the identical batch composition on the same files, with the
    planted PII redacted in the landed corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xhtmlkit_spark.datagen import corpus_schema, generate_corpus
    from xhtmlkit_spark.functions.spans import span_text_concat
    from xhtmlkit_spark.operators.extract_stage import extract_spans
    from xhtmlkit_spark.operators.lines import c4_line_filter, split_text_lines
    from xhtmlkit_spark.operators.pii import with_pii_redaction
    from xhtmlkit_spark.plans.pipeline import derive_part
    from xhtmlkit_spark.streaming.jobs import streaming_clean_extract

    corpus = generate_corpus(str(tmp_path / "corpus"), 40, seed=13, chunk_docs=20)
    # plant a PII doc as one more landing-zone file
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": ["pii_doc"],
                "spans": [[{
                    "kind": "html",
                    "text": "<p>please contact the team at leak@example.org "
                            "for any of the billing questions today</p>",
                    "media_ref": None, "offset": 0,
                }]],
                "part": [0],
            },
            schema=corpus_schema(),
        ),
        f"{corpus}/part-pii.parquet",
    )

    out, chk = str(tmp_path / "out"), str(tmp_path / "chk")
    streaming_clean_extract(spark, corpus, out, chk, max_files_per_trigger=1)
    streamed = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_kept"], r["n_pii"])
        for r in spark.read.parquet(out).collect()
    }

    from pyspark.sql import functions as F

    docs = extract_spans(derive_part(spark.read.parquet(corpus))).select(
        "doc_id", "part", span_text_concat(F.col("spans"), "\n").alias("text")
    )
    cleaned = c4_line_filter(
        docs, split_text_lines("text"), min_words=3,
        require_terminal_punct=False, passthrough=("part",),
    ).where(F.col("n_kept") > 0)
    batch = {
        r["doc_id"]: (r["redacted"], r["n_lines"], r["n_kept"],
                      r["n_emails"] + r["n_phones"] + r["n_ips"])
        for r in with_pii_redaction(cleaned, text="kept_text").collect()
    }
    assert streamed == batch
    assert streamed["pii_doc"][3] == 1
    assert "<EMAIL>" in streamed["pii_doc"][0]
    assert "leak@example.org" not in streamed["pii_doc"][0]
    # exactly-once: re-draining the same checkpoint adds nothing
    streaming_clean_extract(spark, corpus, out, chk, max_files_per_trigger=1)
    assert spark.read.parquet(out).count() == len(batch)


def test_span_functions_roundtrip(spark):
    from xhtmlkit_spark.functions.spans import (
        explode_spans,
        renest_spans,
        span_text_concat,
    )

    data = [
        (
            "d1",
            [
                {"kind": "text", "text": "alpha", "media_ref": None, "offset": 0},
                {"kind": "media", "text": None, "media_ref": "m.png", "offset": 1},
                {"kind": "text", "text": "beta", "media_ref": None, "offset": 2},
            ],
        )
    ]
    schema = "doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>"
    df = spark.createDataFrame(data, schema)
    assert df.select(span_text_concat("spans").alias("t")).collect()[0]["t"] == "alpha\nbeta"
    back = renest_spans(explode_spans(df)).collect()[0]["spans"]
    assert [s["kind"] for s in back] == ["text", "media", "text"]
    assert [s["offset"] for s in back] == [0, 1, 2]


def test_ivf_learned_quantizer_recall_vs_brute_force(spark):
    """Search-quality evidence for the learned IVF path: recall@5 of
    ivf_ann_topk(kmeans centroids) against brute_force_topk ground
    truth on noisy planted clusters. nprobe=2 must clear 0.9 and
    multi-probe must not lose recall vs single-probe (the whole point
    of probing neighbor cells is recovering boundary cases)."""
    import random

    from xhtmlkit_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
        kmeans_centroids,
    )

    rng = random.Random(47)
    axes = [[rng.gauss(0, 1) for _ in range(32)] for _ in range(8)]
    rows = []
    vid = 0
    for a in axes:
        for _ in range(25):
            rows.append((vid, [x + rng.gauss(0, 1.0) for x in a]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = 5
    gt: dict = {}
    for r in brute_force_topk(df, df, k=k).collect():
        gt.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    cents = kmeans_centroids(df, n_cells=8, iters=8, sample_rows=200)

    def recall(nprobe: int) -> float:
        got: dict = {}
        for r in ivf_ann_topk(
            df, k=k, n_cells=8, nprobe=nprobe, centroids=cents, dim=32
        ).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = sum(len(gt[q] & got.get(q, set())) for q in gt)
        return hits / sum(len(v) for v in gt.values())

    r1, r2 = recall(1), recall(2)
    assert r2 >= 0.9, f"recall@5 at nprobe=2 = {r2:.3f}"
    assert r2 >= r1, (r1, r2)


def test_tfidf_top_terms_ranks_rare_terms(spark):
    from xhtmlkit_spark.operators.text_stats import tfidf_top_terms

    # "common" appears in every doc (idf ~ 0); each doc also carries a
    # unique term which must outrank it despite lower tf
    df = spark.createDataFrame(
        [
            (1, "common common common apple"),
            (2, "common common banana banana"),
            (3, "common cherry"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(df, top_n=2).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["term"], r["score_u"]))
    assert set(by_doc) == {1, 2, 3}  # NULL-text doc contributes nothing
    for doc, uniq in [(1, "apple"), (2, "banana"), (3, "cherry")]:
        ranked = sorted(by_doc[doc])
        assert ranked[0][1] == uniq, (doc, ranked)
        # idf of the everywhere-term is ln(4/4)=0 -> score 0
        assert ranked[1][1] == "common" and ranked[1][2] == 0


def test_bigram_doc_freq_counts_docs_not_occurrences(spark):
    from xhtmlkit_spark.operators.text_stats import bigram_doc_freq

    df = spark.createDataFrame(
        [
            (1, "big data big data"),  # repeated bigram counts once per doc
            (2, "big data rocks"),
            (3, "small data"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["bigram"]: r["n_docs"] for r in bigram_doc_freq(df, top_n=10).collect()}
    assert out["big data"] == 2
    assert out["data big"] == 1
    assert out["small data"] == 1
    assert "data" not in out  # full bigrams only for multi-token docs


def test_asof_join_backward_semantics(spark):
    from xhtmlkit_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, 50), (2, 100, 10), (3, 200, 50), (4, None, 50), (5, 100, None)],
        "eid long, k long, t long",
    )
    right = spark.createDataFrame(
        [
            (100, 20, 7, 1.5),   # matched by eid=1 (ties below beat it? no: ts 20 < 50)
            (100, 50, 8, 2.5),   # ts == left ts -> matches; tie with next row
            (100, 50, 9, None),  # equal ts, higher tie wins even with NULL value
            (100, 60, 10, 4.5),  # in the future -> never matches backward
            (200, None, 11, 5.0),  # NULL right ts dropped
            (None, 10, 12, 6.0),   # NULL right key dropped
        ],
        "k long, t long, tie long, v double",
    )
    out = asof_join(
        left.withColumnRenamed("t", "lts"),
        right.withColumnRenamed("t", "rts"),
        left_on="k", right_on="k", left_ts="lts", right_ts="rts",
        value_cols=["tie", "v"], right_tie="tie",
    )
    got = {r["eid"]: (r["tie"], r["v"]) for r in out.collect()}
    assert got[1] == (9, None)     # highest tie at equal ts; its genuine NULL v kept
    assert got[2] == (None, None)  # no order at/before ts=10
    assert got[3] == (None, None)  # key 200 has only NULL-ts rows
    assert got[4] == (None, None)  # NULL left key -> no match
    assert got[5] == (None, None)  # NULL left ts -> no match
    assert len(got) == 5           # left-outer: every left row kept


def test_asof_join_forward_and_tolerance(spark):
    from xhtmlkit_spark.operators.asof import asof_join
    import datetime as dt

    base = dt.datetime(2024, 1, 1)

    def ts(s):
        return base + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, 1, ts(0)), (2, 1, ts(100)), (3, 1, ts(500))],
        "eid long, k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(10), 5, "a"), (1, ts(10), 4, "b"), (1, ts(400), 6, "c")],
        "k long, rts timestamp, tie long, v string",
    )
    fwd = asof_join(
        left, right, left_on="k", right_on="k", left_ts="lts", right_ts="rts",
        value_cols=["v"], right_tie="tie", direction="forward",
    )
    got = {r["eid"]: r["v"] for r in fwd.collect()}
    # earliest future row; equal-ts tie -> LOWEST tie wins forward
    assert got == {1: "b", 2: "c", 3: None}

    tol = asof_join(
        left, right, left_on="k", right_on="k", left_ts="lts", right_ts="rts",
        value_cols=["v"], right_tie="tie", direction="forward",
        tolerance_seconds=50,
    )
    got_tol = {r["eid"]: r["v"] for r in tol.collect()}
    assert got_tol == {1: "b", 2: None, 3: None}  # 300s gap nulled by tolerance


def test_repetition_scores_flag_repetitive_docs(spark):
    from xhtmlkit_spark.operators.text_stats import repetition_scores

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # fully repetitive
            (2, "all words here are different"),  # no repetition
            (3, "one"),                           # single token: ratios 0
            (4, None),                            # dropped
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in repetition_scores(df).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["top_token_ratio_u"] == 1_000_000
    assert out[1]["dup_token_ratio_u"] == 750_000
    assert out[1]["dup_bigram_ratio_u"] == 666_667  # round-half-up(2/3 * 1e6)
    assert out[2]["top_token_ratio_u"] == 200_000
    assert out[2]["dup_token_ratio_u"] == 0
    assert out[2]["dup_bigram_ratio_u"] == 0
    assert out[3]["n_tokens"] == 1 and out[3]["dup_bigram_ratio_u"] == 0


def test_contamination_scores_planted_overlap(spark):
    from xhtmlkit_spark.operators.dedup import contamination_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),        # shares its prefix with bench
            (2, "totally unrelated words here"),  # clean
            (3, None),                            # dropped
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "alpha beta gamma zulu"), (11, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r.asDict() for r in contamination_scores(docs, bench, k=3).collect()}
    assert set(out) == {1, 2}
    # doc 1 shingles: {alpha beta gamma, beta gamma delta} -> 1 of 2 in bench
    assert out[1]["n_shingles"] == 2 and out[1]["n_hits"] == 1
    assert out[1]["contamination_u"] == 500_000
    assert out[2]["n_hits"] == 0 and out[2]["contamination_u"] == 0

    # benchmark side must broadcast (corpus shingles never shuffle)
    plan = contamination_scores(docs, bench, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_resample_forward_fill_grid_and_ties(spark):
    from xhtmlkit_spark.operators.asof import resample_forward_fill
    import datetime as dt

    base = dt.datetime(2024, 3, 1)

    def ts(m):
        return base + dt.timedelta(minutes=m)

    df = spark.createDataFrame(
        [
            (1, 7, ts(10), 1.0),
            (2, 7, ts(150), 2.0),
            (3, 7, ts(150), 3.0),  # same instant: higher event_id wins
            (4, 8, ts(0), 9.0),    # grid point exactly at the observation
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = resample_forward_fill(
        df, key="user_id", ts="ts", value_col="value", tie_col="event_id"
    )
    got = {(r["user_id"], r["grid_ts"]): r["value"] for r in out.collect()}
    # user 7: grid 00:00 (before first obs -> NULL), 01:00, 02:00
    assert got[(7, ts(0))] is None
    assert got[(7, ts(60))] == 1.0
    assert got[(7, ts(120))] == 1.0
    assert (7, ts(180)) not in got  # grid stops at max ts (02:30)
    # user 8: single point, observation exactly on the grid
    assert got[(8, ts(0))] == 9.0
    assert len(got) == 4


def test_foreach_batch_upsert_exactly_once_layout(spark, tmp_path):
    """foreachBatch sink: per-batch overwrite directories make replayed
    micro-batches idempotent, and a resumed stream delivers only new
    batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xhtmlkit_spark.streaming.jobs import run_foreach_batch_upsert

    src = tmp_path / "src"
    src.mkdir()

    def add_file(name, ids):
        pq.write_table(pa.table({"event_id": ids, "value": [float(i) for i in ids]}),
                       str(src / name))

    add_file("f1.parquet", [1, 2, 3])
    add_file("f2.parquet", [4, 5])

    schema = "event_id long, value double"
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )

    n1 = run_foreach_batch_upsert(stream(), out, ckpt)
    assert n1 == 2  # one micro-batch per file
    landed = spark.read.option("basePath", out).parquet(out)
    assert {r["event_id"] for r in landed.collect()} == {1, 2, 3, 4, 5}
    assert {r["batch_id"] for r in landed.select("batch_id").collect()} == {0, 1}

    # simulated REPLAY of batch 1 (same pinned content) changes nothing.
    # The batch's content comes from the OUTPUT, not a hardcoded file:
    # the file source breaks equal-mtime ties arbitrarily, so batch 1
    # may be either source file — a replay is pinned to whatever the
    # checkpointed offsets actually assigned it.
    b1_rows = spark.read.parquet(f"{out}/batch_id=1").collect()
    replay = spark.createDataFrame(
        [(r["event_id"], r["value"]) for r in b1_rows], schema
    )
    replay.write.mode("overwrite").parquet(f"{out}/batch_id=1")
    assert spark.read.option("basePath", out).parquet(out).count() == 5

    # resume: a new file yields exactly one new batch, old dirs intact
    add_file("f3.parquet", [6])
    n2 = run_foreach_batch_upsert(stream(), out, ckpt)
    assert n2 == 1
    landed2 = spark.read.option("basePath", out).parquet(out)
    assert {r["event_id"] for r in landed2.collect()} == {1, 2, 3, 4, 5, 6}
    assert {r["batch_id"] for r in landed2.select("batch_id").collect()} == {0, 1, 2}


def _pack_reference(docs, context_len):
    """Pure-Python packing reference: concat tokens in doc_id order,
    cut every context_len tokens."""
    out = []
    off = 0
    for doc_id, text in sorted(docs, key=lambda d: d[0]):
        if text is None or not text.strip():
            continue
        n = len(text.strip().split())
        start, end = off, off + n
        for chunk in range(start // context_len, (end - 1) // context_len + 1):
            lo = max(start, chunk * context_len)
            hi = min(end, (chunk + 1) * context_len)
            out.append((doc_id, chunk, lo - start, hi - lo))
        off = end
    return sorted(out)


def test_pack_chunks_matches_reference_and_covers(spark):
    """pack_chunks must equal the concat-and-chunk reference exactly:
    every token covered once, every chunk but the last exactly full,
    docs straddling chunk boundaries split correctly."""
    import random

    from xhtmlkit_spark.operators.packing import pack_chunks

    rng = random.Random(7)
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(rng.randint(1, 40)))) for i in range(60)]
    rows += [(100, None), (101, "   "), (102, "x " * 75)]  # 75 tokens straddles
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = sorted(
        (r["doc_id"], r["chunk_id"], r["tok_start"], r["tok_len"])
        for r in pack_chunks(df, context_len=32, n_buckets=8).collect()
    )
    assert got == _pack_reference(rows, 32)

    # chunk-level invariant: all full except the last
    by_chunk: dict = {}
    for _, chunk, _, ln in got:
        by_chunk[chunk] = by_chunk.get(chunk, 0) + ln
    last = max(by_chunk)
    assert all(v == 32 for c, v in by_chunk.items() if c != last)
    assert 0 < by_chunk[last] <= 32
    # doc-level invariant: every kept doc fully covered in order
    per_doc: dict = {}
    for doc_id, _, start, ln in got:
        per_doc.setdefault(doc_id, []).append((start, ln))
    for doc_id, pieces in per_doc.items():
        pieces.sort()
        pos = 0
        for start, ln in pieces:
            assert start == pos
            pos += ln


def test_pack_chunks_invariant_to_layout_and_buckets(spark):
    """The packing plan is a pure function of (ids, texts, context_len):
    input partitioning and the internal bucket count must not change a
    single row, and the only nested-loop join in the plan is the
    bounded 1-row id-bounds broadcast."""
    from xhtmlkit_spark.operators.packing import pack_chunks

    rows = [(i, " ".join(f"t{j}" for j in range(5 + i % 17))) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(d, nb):
        return sorted(map(tuple, pack_chunks(d, context_len=64, n_buckets=nb).collect()))

    base = run(df, 16)
    assert base == run(df.repartition(13), 16)
    assert base == run(df.repartition(1), 3)
    assert base == run(df, 1)

    # the only nested-loop joins are the bounded 1-row id-bounds
    # broadcast, which appears once per consumer of the docs subtree
    # (bucket totals + per-row offsets) — never a corpus×corpus shape
    plan = pack_chunks(df, context_len=64, n_buckets=16)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 2

    # pre-counted path (the 100 TB shape: counts materialized once)
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.text_stats import with_token_counts

    pre = with_token_counts(df).withColumn(
        "n_tokens",
        F.when(F.trim("text") == "", F.lit(0)).otherwise(F.col("n_tokens")),
    )
    got = sorted(
        map(tuple, pack_chunks(pre, context_len=64, count_col="n_tokens").collect())
    )
    assert got == base


def test_pack_chunks_shuffled_order_and_no_bounds_join(spark):
    """shuffle_seed packs in deterministic md5(seed+id) order: matches
    the Python reference exactly, reruns identically, changes order
    with the seed, and the hash-bucket path carries NO nested-loop
    join at all."""
    import hashlib
    import random

    from xhtmlkit_spark.operators.packing import pack_chunks

    rng = random.Random(3)
    rows = [(i, " ".join(f"w{j}" for j in range(rng.randint(1, 30)))) for i in range(70)]
    rows += [(900, None), (901, " ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def ref(seed, clen):
        out, off = [], 0
        kept = [(d, t) for d, t in rows if t and t.strip()]
        for doc_id, text in sorted(
            kept, key=lambda d: (hashlib.md5((seed + str(d[0])).encode()).hexdigest(), d[0])
        ):
            n = len(text.strip().split())
            start, end = off, off + n
            for chunk in range(start // clen, (end - 1) // clen + 1):
                lo, hi = max(start, chunk * clen), min(end, (chunk + 1) * clen)
                out.append((doc_id, chunk, lo - start, hi - lo))
            off = end
        return sorted(out)

    def run(seed, nb):
        return sorted(
            map(
                tuple,
                pack_chunks(df, context_len=32, n_buckets=nb, shuffle_seed=seed).collect(),
            )
        )

    assert run("s1", 8) == ref("s1", 32)
    assert run("s1", 8) == run("s1", 3)  # bucket count is internal
    assert run("s2", 8) == ref("s2", 32)
    assert run("s1", 8) != run("s2", 8)  # the seed actually reshuffles

    plan = (
        pack_chunks(df, context_len=32, shuffle_seed="s1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pack_chunks_quantile_buckets_balance_powerlaw_ids(spark):
    """quantile_buckets on a planted power-law id space: the emitted
    plan is identical to the uniform-range path (bucketing only
    decomposes the prefix sum), and the bucket row counts stay
    balanced where uniform ranges pile ~everything into bucket 0."""
    from xhtmlkit_spark.operators.packing import _assign_buckets, pack_chunks

    # power-law ids: the top id is ~2^40, but 90% of docs sit below 2^8
    rows = [
        (2 ** (1 + (i * i) % 40) + i, "tok " * (3 + i % 7))
        for i in range(160)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def run(**kw):
        return sorted(map(tuple, pack_chunks(df, context_len=16, **kw).collect()))

    assert run(quantile_buckets=True, n_buckets=8) == run(n_buckets=8)
    assert run(quantile_buckets=True, n_buckets=8) == run(
        quantile_buckets=True, n_buckets=3
    )

    from pyspark.sql import functions as F

    docs = df.select("doc_id", F.lit(1).cast("long").alias("n_tok"))
    def spread(quantile):
        counts = [
            r["c"]
            for r in _assign_buckets(docs, 8, None, quantile)
            .groupBy("bucket")
            .agg(F.count("*").alias("c"))
            .collect()
        ]
        return max(counts), len(counts)

    q_max, q_nonempty = spread(True)
    u_max, _ = spread(False)
    n = len(rows)
    # uniform ranges on this id space collapse: nearly every doc lands
    # in one bucket; quantile bounds keep the biggest bucket within 3x
    # of the ideal n/8 share and actually use the buckets
    assert u_max > 0.8 * n
    assert q_max <= 3 * (n / 8)
    assert q_nonempty >= 6


# ------------------------------------------------------------------ urls


def test_url_host_normalization(spark):
    """Every normalization path of url_host: userinfo, port, www,
    case, and non-URL → NULL."""
    from xhtmlkit_spark.operators.urls import url_host

    cases = [
        ("https://Example.ORG/a", "example.org"),
        ("http://www.example.org/x?q=1", "example.org"),
        ("https://u:p@example.org:8443/p", "example.org"),
        ("ftp://WWW.Sub.Example.org", "sub.example.org"),
        ("https://www.www.example.org", "www.example.org"),  # one www only
        ("not a url", None),
        ("/relative/path", None),
        ("", None),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {r["i"]: r["host"] for r in df.select("i", url_host("url").alias("host")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i], got[i])


def test_url_blocklist_and_cap(spark):
    """Blocklist anti-join drops exactly the listed hosts; the cap
    keeps the lowest-order rows per host, deterministically."""
    from xhtmlkit_spark.operators.urls import cap_per_host, filter_blocklist

    rows = [(d, f"h{d % 3}.org") for d in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, host string")
    kept = filter_blocklist(df, ["h2.org"])
    assert kept.where("host = 'h2.org'").count() == 0
    assert kept.count() == 20
    capped = cap_per_host(kept, cap=4, order_col="doc_id")
    out = sorted((r["host"], r["doc_id"], r["host_rank"]) for r in capped.collect())
    # h0: docs 0,3,6,9; h1: docs 1,4,7,10 — ranks 1..4 by ascending id
    assert out == [
        ("h0.org", 0, 1), ("h0.org", 3, 2), ("h0.org", 6, 3), ("h0.org", 9, 4),
        ("h1.org", 1, 1), ("h1.org", 4, 2), ("h1.org", 7, 3), ("h1.org", 10, 4),
    ]
    # rerun is identical (deterministic survivors)
    again = sorted((r["host"], r["doc_id"], r["host_rank"]) for r in capped.collect())
    assert again == out


def test_robots_parse_and_filter(spark):
    """Google-REP robots subset: comments/blank lines, multi-UA groups
    (star group applies, others ignored), longest-prefix decision,
    allow-wins ties, no-match/no-rules → allowed."""
    from xhtmlkit_spark.operators.urls import parse_robots, robots_filter

    robots = (
        "# banner comment\n"
        "User-agent: fancybot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "User-agent: megabot\n"
        "Disallow: /p/1\n"
        "Allow: /p/12\n"
        "Disallow: /p/3\n"
        "Allow: /p/3\n"
        "Disallow:\n"  # empty value: no rule (REP allow-all)
    )
    rdf = spark.createDataFrame(
        [("h.org", robots), ("otherbot.org", "User-agent: bot\nDisallow: /")],
        "host string, robots_txt string",
    )
    rules = parse_robots(rdf)
    got_rules = sorted(
        tuple(r) for r in rules.select("host", "directive", "path_prefix").collect()
    )
    assert got_rules == [
        ("h.org", "allow", "/p/12"),
        ("h.org", "allow", "/p/3"),
        ("h.org", "disallow", "/p/1"),
        ("h.org", "disallow", "/p/3"),
    ]
    urls = spark.createDataFrame(
        [
            ("d0", "h.org", "/p/1"),       # blocked
            ("d1", "h.org", "/p/12"),      # longer allow wins
            ("d2", "h.org", "/p/120"),     # prefix of allow still wins
            ("d3", "h.org", "/p/3"),       # tie → allow
            ("d4", "h.org", "/p/2"),       # no match → allowed
            ("d5", "otherbot.org", "/p/1"),  # no star group → allowed
            ("d6", "norules.org", "/x"),   # host absent from rules
        ],
        "doc_id string, host string, path string",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {
        "d0": (False, "/p/1"),
        "d1": (True, "/p/12"),
        "d2": (True, "/p/12"),
        "d3": (True, "/p/3"),
        "d4": (True, None),
        "d5": (True, None),
        "d6": (True, None),
    }
    assert len(got) == urls.count()  # the left join never loses a row


def test_normalize_url_matrix(spark):
    """URL canonicalization matrix: case, default ports, userinfo,
    www., fragment, tracking params, param sort, empty path, non-URL."""
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.urls import normalize_url

    cases = [
        ("HTTP://WWW.Ex.COM:80/A/b?z=2&utm_source=x&a=1#f",
         "http://ex.com/A/b?a=1&z=2"),
        ("https://u:p@Host.ORG:443/p", "https://host.org/p"),
        ("https://ex.net", "https://ex.net/"),
        ("https://ex.net#frag", "https://ex.net/"),
        ("http://ex.com/p?fbclid=1&gclid=2&msclkid=3&mc_eid=4",
         "http://ex.com/p"),
        # ref is FUNCTIONAL on code hosts (?ref=branch): kept, not tracking
        ("http://ex.com/p?ref=main", "http://ex.com/p?ref=main"),
        ("http://ex.io:8080/x?b=2&a=1", "http://ex.io:8080/x?a=1&b=2"),
        # :443 is only default for https (and :80 only for http)
        ("http://ex.com:443/p", "http://ex.com:443/p"),
        ("ftp://Files.Ex.com/pub", "ftp://files.ex.com/pub"),
        ("no scheme here", None),
        ("/relative/only", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["n"]
        for r in df.select("url", normalize_url("url").alias("n")).collect()
    }
    for url, want in cases:
        assert got[url] == want, (url, got[url], want)


def test_robots_wildcards_matrix(spark):
    """Google-REP wildcard matrix: ``*`` spans any run (incl. ``/``),
    trailing ``$`` anchors end-of-path, interior ``$`` is literal,
    regex metachars in patterns/paths stay literal, longest PATTERN
    (octets) wins, ties go allow-first then lexically-smallest."""
    from xhtmlkit_spark.operators.urls import parse_robots, robots_filter

    robots = (
        "User-agent: *\n"
        "Disallow: /*?\n"          # any path containing a query string
        "Allow: /p/ok?*\n"         # ...except under /p/ok
        "Disallow: /exact$\n"      # exactly /exact, nothing longer
        "Disallow: /a/*/deep\n"    # * crosses a path segment
        "Disallow: /lit$eral\n"    # interior $ is a literal octet
        "Disallow: /dot.x\n"       # '.' must not match any char
        "Allow: /tie/aa\n"         # same length as the disallow below
        "Disallow: /tie/ab\n"      # allow wins the length tie on /tie/a*...
        "Allow: /tie/a*\n"         # wildcard same length as /tie/aa? no: 7 vs 7
    )
    rdf = spark.createDataFrame([("w.org", robots)], "host string, robots_txt string")
    rules = parse_robots(rdf)
    urls = spark.createDataFrame(
        [
            ("q0", "w.org", "/page?s=1"),        # /*? blocks
            ("q1", "w.org", "/p/ok?s=1"),        # longer allow wins
            ("q2", "w.org", "/page"),            # no ? → no /*? match
            ("e0", "w.org", "/exact"),           # $ anchored: blocked
            ("e1", "w.org", "/exact/sub"),       # past the anchor: allowed
            ("s0", "w.org", "/a/x/y/deep"),      # * crosses segments
            ("s1", "w.org", "/a/deep"),          # nothing between → no match
            ("l0", "w.org", "/lit$eral"),        # interior $ literal
            ("d0", "w.org", "/dotax"),           # '.' stays literal → no match
            ("d1", "w.org", "/dot.x"),           # literal '.' matches itself
            ("t0", "w.org", "/tie/aa"),          # allow/disallow-adjacent tie
        ],
        "doc_id string, host string, path string",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in robots_filter(urls, rules).collect()
    }
    assert got == {
        "q0": (False, "/*?"),
        "q1": (True, "/p/ok?*"),
        "q2": (True, None),
        "e0": (False, "/exact$"),
        "e1": (True, None),
        "s0": (False, "/a/*/deep"),
        "s1": (True, None),
        "l0": (False, "/lit$eral"),
        "d0": (True, None),
        "d1": (False, "/dot.x"),
        # /tie/aa matches allow /tie/aa (7), allow /tie/a* (7), and
        # NOT disallow /tie/ab; among the two same-length allows the
        # lexically-smallest pattern is reported (/tie/a* < /tie/aa)
        "t0": (True, "/tie/a*"),
    }


def test_robust_length_outliers_mad_and_degenerate(spark):
    """Planted lengths: median 10, MAD 2 → the 1000-char doc is an
    outlier; a constant-length corpus (MAD=0) yields NULL scores,
    never ±inf."""
    from xhtmlkit_spark.operators.text_stats import robust_length_outliers

    rows = [(str(i), "x" * n) for i, n in
            enumerate([8, 9, 10, 11, 12, 10, 10, 1000])]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r for r in robust_length_outliers(df).collect()}
    assert got["7"]["is_outlier"] is True
    assert all(got[str(i)]["is_outlier"] is False for i in range(7))
    # median of [8,9,10,10,10,10,11,12,1000] lengths: 8 docs → 10;
    # MAD over |n-10| = [2,1,0,1,2,0,0,990] → median 1.0
    assert got["2"]["robust_z_u"] == 0

    const = spark.createDataFrame(
        [(str(i), "y" * 5) for i in range(6)], "doc_id string, text string"
    )
    out = robust_length_outliers(const).collect()
    assert all(r["robust_z_u"] is None and r["is_outlier"] is None for r in out)


def test_char_entropy_known_values(spark):
    """aaaa → 0; uniform 4-char alphabet → ln 4; empty/NULL drop."""
    import math

    from xhtmlkit_spark.operators.text_stats import char_entropy_scores

    df = spark.createDataFrame(
        [("a", "aaaa"), ("b", "abcdabcd"), ("c", ""), ("d", None)],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in char_entropy_scores(df).collect()}
    assert got["a"]["char_entropy_u"] == 0
    # term-wise quantization contract: ln2 quantized to nano-nats FIRST,
    # then exact integer mean — H_u = round(1e6·ln8) - round(round(1e9·ln2)/1000)
    ln2_nano = round(1e9 * math.log(2))
    expect_b = round(1e6 * math.log(8)) - (2 * 8 * ln2_nano + 8000) // 16000
    assert got["b"]["char_entropy_u"] == expect_b
    assert abs(got["b"]["char_entropy_u"] - 1e6 * math.log(4)) < 2  # ≈ ln 4
    assert "c" not in got and "d" not in got


def test_containment_detects_subdocument(spark):
    """A doc fully embedded in a 10x larger doc: containment_ab ~ 1
    while Jaccard is small — the signal this operator adds over
    jaccard_verify."""
    from pyspark.sql import functions as F

    from xhtmlkit_spark.operators.dedup import containment_verify, jaccard_verify

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " " + " ".join(f"filler{i} pad{i} word{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, small), (2, big)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    got = containment_verify(pairs, df, text="text", k=2).collect()[0]
    jac = jaccard_verify(pairs, df, text="text", k=2).collect()[0]["jaccard_u"]
    assert got["containment_ab_u"] == 1_000_000
    assert got["containment_ba_u"] < 200_000
    assert jac < 200_000


def test_inverted_index_stats_digest_capped(spark):
    """df/tf count every occurrence; the postings digest stops at the
    cap in (doc_id, pos) order; min_df drops rare terms."""
    from xhtmlkit_spark.operators.text_stats import inverted_index_stats

    rows = [(1, "hot hot cold"), (2, "hot warm"), (3, "hot warm"), (4, "hot")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["term"]: r
        for r in inverted_index_stats(df, max_postings=3, min_df=2).collect()
    }
    assert set(got) == {"hot", "warm"}  # cold df=1 dropped
    assert (got["hot"]["df"], got["hot"]["tf"]) == (4, 5)
    assert got["hot"]["top_postings"] == "1:0,1:1,2:0"  # capped at 3
    assert got["warm"]["top_postings"] == "2:1,3:1"


def test_robots_sitemaps_global_and_dedup(spark):
    from xhtmlkit_spark.operators.urls import robots_sitemaps

    txt = (
        "# c\nSitemap: https://h.org/a.xml\nUser-agent: bot\nDisallow: /\n"
        "sitemap: https://h.org/b.xml\n"      # case-insensitive key
        "Sitemap: https://h.org/a.xml\n"      # duplicate dedupes
        "# Sitemap: https://h.org/no.xml\n"   # commented out
        "Sitemap:\n"                           # empty value dropped
    )
    df = spark.createDataFrame([("h.org", txt)], "host string, robots_txt string")
    got = sorted(r["sitemap_url"] for r in robots_sitemaps(df).collect())
    assert got == ["https://h.org/a.xml", "https://h.org/b.xml"]


def test_contamination_spans_excises_planted_quote(spark):
    """A benchmark passage quoted mid-document comes back as ONE
    contiguous token span covering exactly the quote; two disjoint
    quotes give two spans."""
    from xhtmlkit_spark.operators.dedup import contamination_spans

    quote = "alpha beta gamma delta epsilon"
    doc1 = "x1 x2 x3 " + quote + " y1 y2 y3 y4"
    doc2 = quote + " z1 z2 z3 z4 z5 " + quote
    corpus = spark.createDataFrame(
        [(1, doc1), (2, doc2), (3, "clean w1 w2 w3 w4 w5")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(99, quote)], "doc_id long, text string")
    got = {}
    for r in contamination_spans(corpus, bench, k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_idx"], r["tok_start"], r["tok_len"])
        )
    # doc1: quote tokens at positions 3..7 → shingle hits 3,4,5 → one
    # span tok_start=3, tok_len=3+3-1=5 — exactly the quote
    assert got[1] == [(1, 3, 5)]
    # doc2: quote at 0..4, five fillers at 5..9, quote again at 10..14
    assert got[2] == [(1, 0, 5), (2, 10, 5)]
    assert 3 not in got


def test_duplicate_passages_finds_shared_runs(spark):
    """Corpus-SELF duplicated passages (R66): a passage shared by two
    documents comes back as one contiguous span in EACH, with exact
    token boundaries; a within-doc repeat alone (one document) does
    not count toward min_docs; unique text yields nothing."""
    from xhtmlkit_spark.operators.dedup import duplicate_passages

    passage = "p1 p2 p3 p4 p5 p6"
    corpus = spark.createDataFrame(
        [
            (1, "a1 a2 " + passage + " a3 a4"),
            (2, passage + " b1 b2 b3 b4 b5"),
            # the same trigram TWICE in one doc, nowhere else: distinct-doc
            # count is 1 → not a duplicate passage
            (3, "q1 q2 q3 c1 c2 q1 q2 q3"),
            (4, "unique u1 u2 u3 u4 u5 u6"),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in duplicate_passages(corpus, k=3, checkpoint=False).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_idx"], r["tok_start"], r["tok_len"], r["n_grams"])
        )
    # doc1: passage tokens at 2..7 → gram hits 2,3,4,5 → one span
    # tok_start=2, tok_len=4+3-1=6 — exactly the passage
    assert got[1] == [(1, 2, 6, 4)]
    # doc2: passage at 0..5 → hits 0..3
    assert got[2] == [(1, 0, 6, 4)]
    assert 3 not in got and 4 not in got
    # a stricter threshold: the pair-shared passage no longer qualifies
    assert (
        duplicate_passages(corpus, k=3, min_docs=3, checkpoint=False).count()
        == 0
    )


def test_robots_crawl_delay(spark):
    """Group scoping, largest-wins, non-numeric drop, comment strip."""
    from xhtmlkit_spark.operators.urls import robots_crawl_delay

    rob = spark.createDataFrame(
        [
            ("a.ex", "User-agent: bot\nCrawl-delay: 99\n\nUser-agent: *\nCrawl-delay: 2\n"),
            ("b.ex", "User-agent: *\nCrawl-delay: 0.5\nCrawl-delay: 10 # slow\n"),
            ("c.ex", "User-agent: *\nCrawl-delay: fast\n"),
            ("d.ex", "User-agent: *\nDisallow: /\n"),
            ("e.ex", "User-agent: bot\nCrawl-delay: 3\n"),  # no * group at all
        ],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay"] for r in robots_crawl_delay(rob).collect()}
    assert got == {"a.ex": 2.0, "b.ex": 10.0}
