"""Training-data pipeline operators: dedup families, ANN, text analysis,
multimodal plumbing, generation metadata, timeuuid decode."""

import uuid

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_dedup_keeps_survivors(spark, docs):
    from scylla_cdc_rust_spark.operators.dedup_docs import exact_dedup

    base = docs.count()
    # inject duplicates: same text, higher doc_id
    dups = docs.limit(5).withColumn("doc_id", F.col("doc_id") + 1_000_000)
    out = exact_dedup(docs.unionByName(dups))
    assert out.count() == base
    assert out.where(F.col("doc_id") >= 1_000_000).count() == 0


def test_minhash_lsh_finds_injected_near_dups(spark, docs):
    from scylla_cdc_rust_spark.operators.dedup_docs import (
        minhash_lsh_candidates,
        minhash_lsh_dedup,
        minhash_signatures,
        ngram_jaccard,
    )

    small = docs.where(F.col("doc_id") < 30)
    # near-dup: copy with one word appended
    near = small.limit(3).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" extra")).alias("text"),
        "lang", "source", "n_chars",
    )
    all_docs = small.unionByName(near)
    sigs = minhash_signatures(all_docs)
    cands = minhash_lsh_candidates(sigs)
    verified = ngram_jaccard(all_docs, cands).where(F.col("jaccard") > 0.7)
    found = {(r["d1"], r["d2"]) for r in verified.collect()}
    # every injected clone is recovered (the corpus also contains natural
    # near-dups, e.g. (8, 12) at jaccard 0.99 — those are legit finds)
    assert {(i, i + 500_000) for i in range(3)} <= found

    deduped = minhash_lsh_dedup(all_docs, jaccard_threshold=0.7)
    n_natural_losers = len({d2 for d1, d2 in found if d2 < 500_000})
    assert deduped.count() == small.count() - n_natural_losers
    assert deduped.where(F.col("doc_id") >= 500_000).count() == 0


def test_dedup_clusters_connected_components(spark):
    """Star-contraction clustering (dedup_docs.dedup_clusters): chains,
    cliques and disjoint components all collapse to min-member clusters
    — the transitivity pairwise dedup lacks (A~B~C with no (A,C) pair
    must still form one cluster)."""
    from scylla_cdc_rust_spark.operators.dedup_docs import dedup_clusters

    # chain 1-2-3-4-5, clique {10,11,12}, pair {20,21}, duplicate+reversed
    # edges, self-loop noise
    pairs = [(1, 2), (2, 3), (3, 4), (5, 4),
             (10, 11), (11, 12), (10, 12), (12, 10),
             (20, 21), (21, 20), (7, 7)]
    df = spark.createDataFrame(pairs, "d1 long, d2 long")
    got = {r["d1"]: r["cluster_id"]
           for r in dedup_clusters(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    # pathological long chain (worst case for label propagation —
    # star contraction converges logarithmically)
    n = 200
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "d1 long, d2 long"
    )
    cl = dedup_clusters(chain)
    assert cl.where(F.col("cluster_id") != 0).count() == 0
    assert cl.count() == n + 1

    # empty input → empty output, no iteration blow-up
    assert dedup_clusters(df.where(F.lit(False))).count() == 0


def test_dedup_clusters_from_lsh_candidates(spark, docs):
    """Production feed: MinHash-LSH candidate pairs (bucketed, never
    all-pairs) → star-contraction clusters.  Injected clones of one doc
    must land in ONE cluster with the original as its minimum."""
    from scylla_cdc_rust_spark.operators.dedup_docs import (
        dedup_clusters,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    small = docs.where(F.col("doc_id") < 30)
    clones = [
        small.limit(1).select(
            (F.col("doc_id") + off).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" tail{off}")).alias("text"),
            "lang", "source", "n_chars",
        )
        for off in (500_000, 600_000)
    ]
    all_docs = small.unionByName(clones[0]).unionByName(clones[1])
    cands = minhash_lsh_candidates(minhash_signatures(all_docs))
    cl = {r["d1"]: r["cluster_id"] for r in dedup_clusters(cands).collect()}
    # doc 0 and both clones share one cluster rooted at the original
    assert cl.get(500_000) == cl.get(600_000) == cl.get(0, 0) == 0


def test_hash_impl_parity_portable_vs_xxhash64(spark, docs):
    """The production xxhash64 mode must select statistically-equivalent
    (not identical) sets to the oracle-portable md5 mode (VERDICT r3
    #5): contamination differs only through hash collisions, sampling
    hits its configured rate under either hash family."""
    from scylla_cdc_rust_spark.operators.decontam import ngram_contamination
    from scylla_cdc_rust_spark.operators.sampling import (
        sample_hash,
        stratified_sample,
    )

    # benchmark split fixed with the portable hash so BOTH modes see the
    # same corpus/benchmark partition — only the n-gram hashing varies
    is_bench = sample_hash("doc_id", 16) == 0
    corpus, bench = docs.where(~is_bench), docs.where(is_bench)
    out = {
        impl: {
            r["doc_id"]: (r["n_ngrams"], r["contamination"])
            for r in ngram_contamination(
                corpus, bench, n=3, hash_impl=impl
            ).collect()
        }
        for impl in ("portable", "xxhash64")
    }
    a, b = out["portable"], out["xxhash64"]
    assert a, "test corpus has no contaminated docs - fixture too small"
    # flagged sets agree modulo collision noise
    assert len(set(a) ^ set(b)) <= max(2, len(a) // 100)
    for d in set(a) & set(b):
        assert a[d][0] == b[d][0]  # distinct-gram totals: collision-free here
        assert abs(a[d][1] - b[d][1]) < 0.02

    # sampling: both hash families hit the rate within binomial noise,
    # while selecting genuinely different rows
    n = docs.count()
    picked = {
        impl: {
            r["doc_id"]
            for r in stratified_sample(
                docs, {}, default_rate=0.5, hash_impl=impl
            ).select("doc_id").collect()
        }
        for impl in ("portable", "xxhash64")
    }
    for impl, sel in picked.items():
        assert abs(len(sel) / n - 0.5) < 5 * (0.25 / n) ** 0.5, impl
    assert picked["portable"] != picked["xxhash64"]


def test_guard_caches_released_in_session_loop(spark, docs):
    """cap_buckets persists its (bucket, member) projection; a session
    looping over dedup queries must not accumulate one cache per query
    (VERDICT r3 #6): each cap_buckets call releases its predecessor and
    release_guard_caches() drains the last one."""
    from scylla_cdc_rust_spark.operators.dedup_docs import (
        minhash_lsh_dedup,
        release_guard_caches,
        simhash_near_dups,
    )

    release_guard_caches()
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    small = docs.where(F.col("doc_id") < 40)
    for _ in range(2):
        minhash_lsh_dedup(small, jaccard_threshold=0.7).count()
        simhash_near_dups(small).count()
        # at most ONE guard cache outstanding at any point in the loop
        assert jsc.getPersistentRDDs().size() <= baseline + 1
    assert release_guard_caches() == 1
    # other suite tests' stale caches may be reaped by the ContextCleaner
    # while this test runs, so the floor can drop below the recorded
    # baseline — assert no NET growth and that our handle is truly gone
    assert jsc.getPersistentRDDs().size() <= baseline
    assert release_guard_caches() == 0


def test_lsh_hot_bucket_guard_bounds_pairs(spark):
    """Pathological constant-text corpus: every doc lands in ONE LSH
    bucket per band.  The cap salts the mega-bucket into sub-buckets so
    the candidate count stays ~linear instead of C(n,2)-quadratic."""
    from scylla_cdc_rust_spark.operators.dedup_docs import (
        minhash_lsh_candidates,
        minhash_signatures,
    )

    n, cap = 200, 20
    corpus = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate text repeated everywhere").alias("text"),
    )
    sigs = minhash_signatures(corpus)
    uncapped = minhash_lsh_candidates(sigs, max_bucket_size=None).count()
    assert uncapped == n * (n - 1) // 2  # one mega-bucket, quadratic
    capped = minhash_lsh_candidates(sigs, max_bucket_size=cap).count()
    # ≤ bands · ceil(n/cap) · C(cap,2), far below C(n,2)
    nsub = -(-n // cap)
    assert 0 < capped <= 4 * nsub * cap * (cap - 1) // 2
    assert capped < uncapped / 2


def test_ivf_full_probe_equals_brute_force(spark, embs):
    """nprobe == n_centroids probes every cell ⇒ IVF must reproduce the
    exact brute-force top-k bit-for-bit (same deterministic tie-break)."""
    from scylla_cdc_rust_spark.operators.ann import brute_force_topk, ivf_topk

    dim = len(embs.select("embedding").first()["embedding"])
    q = embs.where(F.col("vec_id") < 4)
    c = embs.where(F.col("vec_id") >= 4)
    exact = {
        (r["qid"], r["rank"]): (r["cid"], r["cos"])
        for r in brute_force_topk(q, c, k=5).collect()
    }
    full_probe = {
        (r["qid"], r["rank"]): (r["cid"], r["cos"])
        for r in ivf_topk(q, c, dim=dim, k=5, n_centroids=6, nprobe=6).collect()
    }
    assert full_probe == exact


def test_ivf_partial_probe_recall(spark, embs):
    from scylla_cdc_rust_spark.operators.ann import brute_force_topk, ivf_topk

    dim = len(embs.select("embedding").first()["embedding"])
    q = embs.where(F.col("vec_id") < 4)
    c = embs.where(F.col("vec_id") >= 4)
    exact = {(r["qid"], r["cid"]) for r in brute_force_topk(q, c, k=5).collect()}
    approx = {
        (r["qid"], r["cid"])
        for r in ivf_topk(q, c, dim=dim, k=5, n_centroids=6, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"


def test_ivf_centroids_deterministic(spark, embs):
    from scylla_cdc_rust_spark.operators.ann import train_ivf_centroids

    dim = len(embs.select("embedding").first()["embedding"])
    a = train_ivf_centroids(embs, dim, n_centroids=4)
    b = train_ivf_centroids(embs, dim, n_centroids=4)
    assert a == b


def test_ivf_quantizer_train_once_probe_many(spark, embs, tmp_path):
    """The 100 TB contract: train the quantizer ONCE, persist it, and
    every later probe (fresh load, different query batch) must equal a
    probe with the in-memory trained quantizer — no retraining cost and
    no drift through the save/load round-trip."""
    from scylla_cdc_rust_spark.operators.ann import IVFQuantizer

    dim = len(embs.select("embedding").first()["embedding"])
    c = embs.where(F.col("vec_id") >= 4)
    trained = IVFQuantizer.train(c, dim, n_centroids=6)
    store = str(tmp_path / "ivf_index")
    trained.save(store)
    loaded = IVFQuantizer.load(store)
    assert loaded.centroids == trained.centroids
    assert (loaded.dim, loaded.n_centroids) == (dim, 6)
    for lo, hi in ((0, 2), (2, 4)):  # two independent query micro-batches
        q = embs.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi))
        got = {
            (r["qid"], r["rank"]): (r["cid"], r["cos"])
            for r in loaded.topk(q, c, k=5, nprobe=3).collect()
        }
        want = {
            (r["qid"], r["rank"]): (r["cid"], r["cos"])
            for r in trained.topk(q, c, k=5, nprobe=3).collect()
        }
        assert got == want and len(got) == 2 * 5


def test_ivf_grid_quantizer_assignment_covers_cells(spark, embs):
    """The pinned grid quantizer (driver-gate path) must produce a
    non-degenerate cell partition: every vector assigned exactly one
    cell in range, more than one cell populated."""
    from scylla_cdc_rust_spark.operators.ann import IVFQuantizer

    quant = IVFQuantizer.grid(dim=64, n_centroids=8)
    assigned = quant.assign(embs)
    n = embs.count()
    cells = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in cells) == n
    assert all(0 <= r["cell"] < 8 for r in cells)
    assert len(cells) > 1


def test_embedding_hot_bucket_guard(spark):
    from scylla_cdc_rust_spark.operators.ann import embedding_near_dups

    n, cap = 120, 12
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i + 1)) for i in range(8)]).alias("embedding"),
    )
    uncapped = embedding_near_dups(vecs, dim=8, max_bucket_size=None).count()
    assert uncapped == n * (n - 1) // 2
    capped = embedding_near_dups(vecs, dim=8, max_bucket_size=cap).count()
    # hash salting is uneven, so allow ~4x the ideal Σ C(cap,2) bound —
    # still far from quadratic
    nsub = -(-n // cap)
    assert 0 < capped <= 4 * nsub * cap * (cap - 1) // 2
    assert capped < uncapped / 4


def test_simhash_identical_docs_share_sketch(spark, docs):
    from scylla_cdc_rust_spark.operators.dedup_docs import simhash

    d = docs.limit(10)
    s1 = {r["doc_id"]: r["simhash"] for r in simhash(d).collect()}
    copy = d.withColumn("doc_id", F.col("doc_id") + 77)
    s2 = {r["doc_id"] - 77: r["simhash"] for r in simhash(copy).collect()}
    assert s1 == s2


def test_brute_force_vs_lsh_recall(spark, embs):
    from scylla_cdc_rust_spark.operators.ann import brute_force_topk, lsh_topk

    q = embs.where(F.col("vec_id") < 5)
    c = embs.where(F.col("vec_id") >= 5)
    exact = brute_force_topk(q, c, k=5)
    approx = lsh_topk(q, c, dim=64, k=5, n_planes=3)
    e = {(r["qid"], r["cid"]) for r in exact.collect()}
    a = {(r["qid"], r["cid"]) for r in approx.collect()}
    # single-table LSH over random synthetic vectors has modest recall;
    # assert it beats chance while pruning most of the corpus
    assert len(e & a) >= max(2, len(e) // 8)
    assert approx.count() <= 5 * q.count()


def test_embedding_near_dups(spark, embs):
    from scylla_cdc_rust_spark.operators.ann import embedding_near_dups

    base = embs.limit(20)
    clones = base.withColumn("vec_id", F.col("vec_id") + 10_000)
    pairs = embedding_near_dups(base.unionByName(clones), dim=64, threshold=0.999)
    got = {(r["d1"], r["d2"]) for r in pairs.collect()}
    assert {(i, i + 10_000) for i in range(20)} <= got


def test_text_functions(spark, docs):
    from scylla_cdc_rust_spark.functions.text import (
        doc_fingerprint,
        lang_guess,
        quality_score,
        token_count,
        token_count_bpe_ish,
    )

    out = docs.limit(50).select(
        token_count("text").alias("tc"),
        token_count_bpe_ish("text").alias("tcb"),
        quality_score("text").alias("q"),
        lang_guess("text").alias("lg"),
        doc_fingerprint("text").alias("fp"),
    ).collect()
    assert all(r["tc"] > 0 and r["tcb"] >= r["tc"] - 1 for r in out)
    assert all(0.0 <= r["q"] <= 1.0 for r in out)
    assert len({r["fp"] for r in out}) == 50  # distinct docs → distinct fps


def test_multimodal_plumbing(spark):
    """extract_features over REAL payloads: PPM/BMP images and WAV audio
    decoded by the shipped numpy-only codecs (default_registry)."""
    import numpy as np

    from scylla_cdc_rust_spark.operators.multimodal import (
        DecoderRegistry,
        encode_bmp,
        encode_ppm,
        encode_wav,
        extract_features,
        media_stats,
    )

    rows = []
    expect = {}
    for i in range(20):
        if i % 2 == 0:
            w, h = 4 + i % 3, 3 + i % 2
            px = np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3) % 256
            px = ((px + i * 11) % 256).astype(np.uint8)
            payload = encode_ppm(px) if i % 4 == 0 else encode_bmp(px)
            sums = px.reshape(-1, 3).sum(axis=0)
            expect[f"m{i}"] = [float(w), float(h), float(w * h),
                               float(sums[0]), float(sums[1]), float(sums[2])]
            rows.append((f"m{i}", payload,
                         ("image", "raw", w, h, None, len(payload))))
        else:
            samples = (np.arange(100 + i, dtype=np.int64) * 37 % 5000 - 2500).astype(
                np.int16
            )
            payload = encode_wav(samples, 8000)
            expect[f"m{i}"] = [1.0, 8000.0, float(len(samples)),
                               float(np.abs(samples.astype(np.int64)).sum())]
            rows.append((f"m{i}", payload,
                         ("audio", "pcm16", None, None, None, len(payload))))
    media = spark.createDataFrame(
        rows,
        "doc_id string, payload binary, meta struct<media_type:string,"
        "codec:string,width:int,height:int,duration_ms:int,n_bytes:long>",
    )
    feats = extract_features(media, dim=16).collect()
    assert len(feats) == 20 and all(len(r["features"]) == 16 for r in feats)
    # REAL pixel/sample math: dims + exact channel/abs sums round-trip
    got = {r["doc_id"]: r["features"] for r in feats}
    for k, exp in expect.items():
        assert got[k][: len(exp)] == exp, (k, got[k][:6], exp)
    # determinism: same payload → same features
    f2 = extract_features(media, dim=16).collect()
    assert got == {r["doc_id"]: r["features"] for r in f2}
    stats = {r["media_type"]: r["n"] for r in media_stats(media).collect()}
    assert stats == {"image": 10, "audio": 10}
    # unregistered codec raises loudly
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        extract_features(media, registry=DecoderRegistry()).collect()


def test_multimodal_resize_and_frame_sampling(spark):
    """resize_images default path = real decode → nearest-neighbor →
    re-encode in the same container; pixel values pinned vs numpy."""
    import numpy as np

    from scylla_cdc_rust_spark.operators.multimodal import (
        decode_image,
        encode_bmp,
        encode_ppm,
        nearest_resize,
        resize_images,
        sample_frames,
    )

    px0 = (np.arange(32 * 32 * 3, dtype=np.int64) % 256).reshape(32, 32, 3).astype(
        np.uint8
    )
    px1 = ((np.arange(64 * 64 * 3, dtype=np.int64) * 7) % 256).reshape(
        64, 64, 3
    ).astype(np.uint8)
    p0, p1 = encode_ppm(px0), encode_bmp(px1)
    rows = [
        ("img0", p0, ("image", "ppm", 32, 32, None, len(p0))),
        ("img1", p1, ("image", "bmp", 64, 64, None, len(p1))),
        ("vid0", b"\x03" * 64, ("video", "raw", 16, 16, 3500, 64)),
        ("vid1", b"\x04" * 64, ("video", "raw", 16, 16, 500, 64)),
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id string, payload binary, meta struct<media_type:string,"
        "codec:string,width:int,height:int,duration_ms:int,n_bytes:long>",
    )
    resized = {r["doc_id"]: r for r in resize_images(media, 8, 8).collect()}
    assert set(resized) == {"img0", "img1"}  # videos filtered pre-decode
    for r in resized.values():
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
        assert r["meta"]["n_bytes"] == len(r["payload"]) > 0
    # same container back + exact NN pixel math
    assert bytes(resized["img0"]["payload"])[:2] == b"P6"
    assert bytes(resized["img1"]["payload"])[:2] == b"BM"
    np.testing.assert_array_equal(
        decode_image(bytes(resized["img0"]["payload"])), nearest_resize(px0, 8, 8)
    )
    np.testing.assert_array_equal(
        decode_image(bytes(resized["img1"]["payload"])), nearest_resize(px1, 8, 8)
    )
    # determinism
    again = {r["doc_id"]: bytes(r["payload"]) for r in resize_images(media, 8, 8).collect()}
    assert again == {k: bytes(v["payload"]) for k, v in resized.items()}

    frames = sample_frames(media, every_ms=1000).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r["doc_id"], []).append((r["frame_idx"], r["ts_ms"]))
    # 3500ms @1000ms → 4 frames; 500ms → 1 frame; images excluded
    assert {k: len(v) for k, v in per_doc.items()} == {"vid0": 4, "vid1": 1}
    assert sorted(per_doc["vid0"]) == [(0, 0), (1, 1000), (2, 2000), (3, 3000)]
    assert all(len(r["frame"]) == 32 for r in frames)  # sha256 fake frames


def test_generation_fetcher(tmp_path):
    from scylla_cdc_rust_spark.sources.generations import (
        Generation,
        GenerationFetcher,
        write_generation_metadata,
    )

    gens = [Generation(0, 1000), Generation(1, 2000), Generation(2, 3000)]
    streams = [(0, b"\x01", 0), (0, b"\x02", 0), (0, b"\x03", 1), (1, b"\x04", 0)]
    write_generation_metadata(str(tmp_path), gens, streams)
    f = GenerationFetcher(str(tmp_path))
    assert f.fetch_all_generations() == gens
    # boundary cases (stream_generations.rs:768-860)
    assert f.fetch_generation_by_timestamp(1999) == gens[0]
    assert f.fetch_generation_by_timestamp(2000) == gens[1]
    assert f.fetch_next_generation(2000) == gens[2]
    assert f.fetch_next_generation(3000) is None
    assert f.fetch_stream_ids(gens[0]) == [[b"\x01", b"\x02"], [b"\x03"]]
    assert f.wait_for_next_generation(1500, timeout_s=0.5) == gens[1]
    assert f.wait_for_next_generation(99999, timeout_s=0.3) is None


def test_timeuuid_decode(spark):
    from scylla_cdc_rust_spark.functions.timeuuid import (
        timeuuid_to_us,
        with_decoded_timeuuid,
    )

    us = [1_700_000_000_000_000 + i * 137 for i in range(100)]
    uuids = [uuid.UUID(fields=(
        ((t * 10 + 122192928000000000) & 0xFFFFFFFF),
        ((t * 10 + 122192928000000000) >> 32) & 0xFFFF,
        0x1000 | (((t * 10 + 122192928000000000) >> 48) & 0x0FFF),
        0x80, 0x00, 0x123456789ABC)).bytes for t in us]
    df = spark.createDataFrame([(u,) for u in uuids], "`cdc$time` binary")
    got = df.select(timeuuid_to_us(F.col("`cdc$time`")).alias("us")).collect()
    assert [r["us"] for r in got] == us
    dec = with_decoded_timeuuid(df).collect()
    assert all(r["cdc_time_ms"] == u // 1000 for r, u in zip(dec, us))
    # ordering preserved by (ms, seq)
    keys = [(r["cdc_time_ms"], r["cdc_time_seq"]) for r in dec]
    assert keys == sorted(keys)


def _v1_uuid(
    ticks_unix_100ns: int, clock_seq: int, node: int = 0x123456789ABC
) -> bytes:
    t = ticks_unix_100ns + 122192928000000000
    return uuid.UUID(fields=(
        t & 0xFFFFFFFF, (t >> 32) & 0xFFFF, 0x1000 | ((t >> 48) & 0x0FFF),
        0x80 | ((clock_seq >> 8) & 0x3F), clock_seq & 0xFF,
        node)).bytes


def test_timeuuid_clock_seq_fidelity(spark):
    """The reference orders by the FULL timeuuid (consumer.rs:193-194);
    the packed ord carries (tick, batch) only, so same-tick collisions
    are resolved by re-ranking seq in full-uuid order (default), or
    rejected loudly under strict=True — never silently collapsed."""
    import pytest

    from scylla_cdc_rust_spark.functions.timeuuid import (
        TimeuuidOrderError,
        with_decoded_timeuuid,
    )

    t0 = 1_700_000_000_000_000 * 10
    # distinct ticks, clock seq varying: fine — tick order IS uuid order
    ok = spark.createDataFrame(
        [("s1", _v1_uuid(t0 + i, 5000 - i)) for i in range(4)],
        "`cdc$stream_id` string, `cdc$time` binary",
    )
    dec = with_decoded_timeuuid(ok, strict=True).collect()
    assert [r["cdc_clock_seq"] for r in dec] == [5000, 4999, 4998, 4997]
    keys = [(r["cdc_time_ms"], r["cdc_time_seq"]) for r in dec]
    assert keys == sorted(keys) and len(set(keys)) == 4
    # same tick in one stream, different clock seq: strict mode refuses
    bad = spark.createDataFrame(
        [("s1", _v1_uuid(t0, 200)), ("s1", _v1_uuid(t0, 100))],
        "`cdc$stream_id` string, `cdc$time` binary",
    )
    with pytest.raises(TimeuuidOrderError, match="uuid bytes"):
        with_decoded_timeuuid(bad, strict=True)
    # DEFAULT mode resolves the collision: seq re-ranked so ord order ==
    # full-uuid order (clock 100 sorts before clock 200); the raw 100ns
    # remainder is preserved alongside
    res = {r["cdc_clock_seq"]: r for r in with_decoded_timeuuid(bad).collect()}
    assert res[100]["cdc_time_seq"] < res[200]["cdc_time_seq"]
    assert res[100]["cdc_time_seq_raw"] == res[200]["cdc_time_seq_raw"] == 0
    assert res[100]["cdc_time_ms"] == res[200]["cdc_time_ms"]
    # same tick in DIFFERENT streams: never compared — allowed, and the
    # default mode leaves collision-free frames' seqs untouched (the
    # lazy resolver always carries the raw column for schema stability,
    # equal to seq when nothing was re-ranked)
    cross = spark.createDataFrame(
        [("s1", _v1_uuid(t0, 100)), ("s2", _v1_uuid(t0, 200))],
        "`cdc$stream_id` string, `cdc$time` binary",
    )
    assert with_decoded_timeuuid(cross, strict=True).count() == 2
    for r in with_decoded_timeuuid(cross).collect():
        assert r["cdc_time_seq_raw"] == r["cdc_time_seq"]
    # strict=False: skip the probe entirely (synthetic-log fast path)
    assert with_decoded_timeuuid(bad, strict=False).count() == 2


def test_clock_seq_bump_replay(spark):
    """engine_cdc_replay-shaped gate on a log containing a clock-seq
    bump: two writers hit the same 100ns tick (a node restart bumps
    clock_seq mid-tick); the reference orders their changes by the full
    timeuuid (consumer.rs:193-194) — higher clock_seq is later and must
    win LWW, per cell, with batch rows staying grouped per uuid."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    t0 = 1_700_000_000_000_000 * 10
    rows = [
        # doc 1 insert at an earlier tick
        ("s1", _v1_uuid(t0, 500), 0, 2, 1, 1, None),
        # same LATER tick, two writers: clock 100 writes (v=10, w=1) as a
        # 2-row batch; clock 200 (the bump — later in uuid order) writes
        # v=20 only.  Full-uuid LWW: v=20 (clock 200 wins), w=1 (only
        # mentioned by clock 100's batch).
        ("s1", _v1_uuid(t0 + 7, 100), 0, 1, 10, None, None),
        ("s1", _v1_uuid(t0 + 7, 100), 1, 1, None, None, 1),
        ("s1", _v1_uuid(t0 + 7, 200), 0, 1, 20, None, None),
        # doc 2: delete (clock 300) vs insert (clock 50) on one tick —
        # the delete is later in uuid order, so the doc stays dead
        ("s2", _v1_uuid(t0 + 9, 50), 0, 2, 7, 2, None),
        ("s2", _v1_uuid(t0 + 9, 300), 0, 3, None, 2, None),
    ]
    rows = [(s, u, b, op, None, v, d if d is not None else 1, w)
            for (s, u, b, op, v, d, w) in rows]
    df = spark.createDataFrame(
        rows,
        "`cdc$stream_id` string, `cdc$time` binary, `cdc$batch_seq_no` int,"
        " `cdc$operation` int, `cdc$ttl` long, v int, doc_id int, w int",
    )
    final = {r["doc_id"]: r for r in fold(
        decode(df), collection_modes={}
    ).collect()}
    assert set(final) == {1}
    assert final[1]["v"] == 20 and final[1]["w"] == 1


def test_decode_raw_timeuuid_log_end_to_end(spark):
    """A log carrying only the raw ``cdc$time`` timeuuid (a real Scylla
    CDC log shape, consumer.rs:193-194) must flow through decode → fold
    without the caller pre-deriving the ms/seq surrogates."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    t0 = 1_700_000_000_000_000 * 10  # unix 100ns ticks
    # doc 1: insert v=10 then update v=20 (later tick wins);
    # doc 2: insert v=7 then row delete → absent from final state
    rows = [
        ("s1", _v1_uuid(t0 + 0, 1), 0, 2, None, 1, 10),
        ("s1", _v1_uuid(t0 + 50_000, 1), 0, 1, None, 1, 20),
        ("s2", _v1_uuid(t0 + 10_000, 9), 0, 2, None, 2, 7),
        ("s2", _v1_uuid(t0 + 90_000, 9), 0, 3, None, 2, None),
    ]
    df = spark.createDataFrame(
        rows,
        "`cdc$stream_id` string, `cdc$time` binary, `cdc$batch_seq_no` int,"
        " `cdc$operation` int, `cdc$ttl` long, doc_id int, v int",
    )
    dec = decode(df)
    assert {"cdc_time_ms", "cdc_time_seq", "cdc_clock_seq", "ord"} <= set(dec.columns)
    final = {r["doc_id"]: r["v"] for r in fold(dec, collection_modes={}).collect()}
    assert final == {1: 20}

    # a raw log with no time column at all is rejected loudly
    with pytest.raises(ValueError, match="not a CDC log"):
        decode(df.drop("cdc$time"))


def test_sequence_packing(spark):
    from scylla_cdc_rust_spark.operators.packing import pack_offsets, pack_stats

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([100, 50, 2048, 10, 3000])],
        "doc_id long, text string",
    )
    offs = {r["doc_id"]: r.asDict() for r in
            pack_offsets(docs, seq_len=1024, n_shards=1).collect()}
    # docs ordered by id within the single shard: offsets are cumulative
    assert offs[0]["start_off"] == 0
    assert offs[1]["start_off"] == 100
    assert offs[2]["start_off"] == 150
    assert offs[2]["first_pack"] == 0 and offs[2]["last_pack"] == 2  # straddles
    assert offs[4]["start_off"] == 100 + 50 + 2048 + 10
    st = pack_stats(pack_offsets(docs, seq_len=1024, n_shards=1), 1024).collect()[0]
    total = 100 + 50 + 2048 + 10 + 3000
    assert st["n_tokens"] == total
    assert st["n_packs"] == -(-total // 1024)
    assert st["tail_waste"] == st["n_packs"] * 1024 - total
    # sharded: every doc appears exactly once, offsets restart per shard
    sharded = pack_offsets(docs, seq_len=1024, n_shards=3).collect()
    assert len(sharded) == 5
    for shard in {r["shard"] for r in sharded}:
        rows = sorted((r for r in sharded if r["shard"] == shard),
                      key=lambda r: r["doc_id"])
        assert rows[0]["start_off"] == 0


def test_stratified_sample_deterministic_rates(spark, docs):
    from scylla_cdc_rust_spark.operators.sampling import stratified_sample

    rates = {"en": 0.5, "de": 0.25}
    s1 = stratified_sample(docs, rates, default_rate=0.1)
    s2 = stratified_sample(docs, rates, default_rate=0.1)
    ids1 = {r["doc_id"] for r in s1.select("doc_id").collect()}
    ids2 = {r["doc_id"] for r in s2.select("doc_id").collect()}
    assert ids1 == ids2 and ids1  # deterministic, non-empty

    by_lang = {
        r["lang"]: r["n"]
        for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # realized fractions near configured rates (small-sample tolerance)
    for lang, n in by_lang.items():
        want = rates.get(lang, 0.1)
        assert abs(n / totals[lang] - want) < 0.25

    # rate 1.0 keeps every row of the stratum; rate 0.0 (default) drops
    keep_all = stratified_sample(docs, {"en": 1.0}, default_rate=0.0)
    assert keep_all.count() == totals["en"]
    assert {r["lang"] for r in keep_all.select("lang").collect()} == {"en"}

    import pytest as _pytest

    with _pytest.raises(ValueError, match="out of"):
        stratified_sample(docs, {"en": 1.5})


def test_ngram_contamination_flags_shared_trigrams(spark):
    from scylla_cdc_rust_spark.operators.decontam import ngram_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "a quick brown fox ran away"),  # shares 'quick brown fox'
            (2, "totally unrelated words here now"),  # no overlap
            (3, "tiny doc"),  # < 3 words: no n-grams at all
            (4, "the quick brown fox jumps high"),  # shares 3 trigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in
           ngram_contamination(corpus, bench, n=3).collect()}
    assert set(out) == {1, 4}
    assert out[1]["n_ngrams"] == 4 and out[1]["n_contaminated"] == 1
    assert out[4]["n_ngrams"] == 4 and out[4]["n_contaminated"] == 3
    assert out[4]["contamination"] == 0.75

    # decontaminate: anti-join on the flagged ids removes docs 1 and 4
    flagged = ngram_contamination(corpus, bench, n=3).select("doc_id")
    clean = corpus.join(flagged, "doc_id", "left_anti")
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}


def test_scale_plan_shapes(spark, docs):
    """Pin the physical-plan properties the 100 TB story rests on:
    stratified sampling compiles to a pure filter (NO exchange), and
    decontamination probes the corpus with a BROADCAST join (the corpus
    n-gram stream is never shuffle-partitioned by hash key)."""
    from scylla_cdc_rust_spark.operators.decontam import ngram_contamination
    from scylla_cdc_rust_spark.operators.sampling import stratified_sample

    sample_plan = stratified_sample(
        docs, {"en": 0.5}, default_rate=0.1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in sample_plan
    assert "Filter" in sample_plan

    bench = docs.where(F.col("doc_id") % 17 == 0)
    corp = docs.where(F.col("doc_id") % 17 != 0)
    cont_plan = ngram_contamination(
        corp, bench, n=3
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in cont_plan
    # the only allowed exchanges: the benchmark-side distinct (tiny) and
    # the per-doc aggregate — never a hash repartition of corpus n-grams
    # feeding the join probe (the probe side must read straight through)
    import re
    assert not re.search(r"SortMergeJoin|ShuffledHashJoin", cont_plan)
    # the explode must not drag the gram ARRAY through every exploded
    # row (O(grams²)/doc): n_ngrams is projected below the Generate
    gen = [l for l in cont_plan.splitlines() if "Generate explode" in l
           and "n_ngrams" in l]
    assert gen and all("gs" not in l.split("], ")[0].split(", [")[-1]
                       for l in gen)


def test_repetition_signals(spark):
    """Gopher-style repetition rules (operators/repetition.py): looped
    boilerplate scores high, unique prose scores 0, short docs default
    to 0.0, and the whole signal block is a zero-shuffle map-side plan."""
    from scylla_cdc_rust_spark.operators.repetition import (
        repetition_filter,
        repetition_stats,
    )

    rows = [
        (1, "spam ham " * 50),           # one 2-gram looped
        (2, " ".join(f"w{i}" for i in range(100))),  # fully unique
        (3, "x"),                        # shorter than any n-gram
        (4, "a b c " * 10 + "tail"),     # repeated phrase
    ]
    df = spark.createDataFrame(
        [(i, t.strip()) for i, t in rows], "doc_id long, text string"
    )
    st = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    # doc 1: "spam ham" repeats 50× of 99 bigrams; dup2 near 1
    assert st[1]["top2_frac"] > 0.49 and st[1]["dup2_frac"] > 0.95
    assert st[2]["top2_frac"] == round(1 / 99, 6) and st[2]["dup2_frac"] == 0.0
    assert st[3]["top2_frac"] == 0.0 and st[3]["dup3_frac"] == 0.0
    assert st[4]["dup3_frac"] > 0.5

    kept = {r["doc_id"] for r in repetition_filter(df).select("doc_id").collect()}
    assert kept == {2, 3}  # looped docs dropped, unique + short kept

    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan


def test_collision_fuzz_full_uuid_order(spark):
    """Randomized raw-timeuuid logs with HEAVY same-tick collisions
    (ticks drawn from a tiny set, random clock_seq AND node): the fold
    over decode()'s re-ranked ord must equal a sequential replay in the
    reference's full-uuid order (timestamp, then bytes 8-15 —
    consumer.rs:193-194), for every seed."""
    import random

    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    t0 = 1_700_000_000_000_000 * 10
    for seed in (11, 23, 47):
        rng = random.Random(seed)
        used = set()
        events = []
        # key space: 8 ticks × 8 clocks × 2 nodes = 128 distinct uuids;
        # drawing 100 forces many same-tick collisions
        while len(events) < 100:
            key = (rng.choice([0, 3, 7, 11, 400, 9000, 9001, 20000]),
                   rng.choice([1, 100, 200, 4000, 8000, 9999, 12000, 16000]),
                   rng.choice([0xAAAAAA, 0xBBBBBB]))
            if key in used:
                continue
            used.add(key)
            doc = rng.randrange(4)
            op = rng.choice([2, 2, 1, 3])  # insert-heavy, some deletes
            v = rng.randrange(1000) if op != 3 else None
            events.append((key, doc, op, v))

        # sequential oracle in full-uuid order
        state = {}
        for (tick, clock, node), doc, op, v in sorted(events):
            k = (tick, clock, node)
            s = state.setdefault(doc, {"marker": None, "tomb": None, "cell": None})
            if op == 3:
                s["tomb"] = max(filter(None, [s["tomb"], k]), default=k)
            else:
                if op == 2:
                    s["marker"] = max(filter(None, [s["marker"], k]), default=k)
                if s["cell"] is None or k > s["cell"][0]:
                    s["cell"] = (k, v)
        expected = {}
        for doc, s in state.items():
            tomb = s["tomb"] or (-1,)
            live_cell = s["cell"] is not None and s["cell"][0] > tomb
            if (s["marker"] or (-1,)) > tomb or live_cell:
                expected[doc] = s["cell"][1] if live_cell else None

        df = spark.createDataFrame(
            [("s1", _v1_uuid(t0 + tick, clock, node), 0, op, None, doc, v)
             for (tick, clock, node), doc, op, v in events],
            "`cdc$stream_id` string, `cdc$time` binary, `cdc$batch_seq_no` int,"
            " `cdc$operation` int, `cdc$ttl` long, doc_id int, v int",
        )
        got = {r["doc_id"]: r["v"]
               for r in fold(decode(df), collection_modes={}).collect()}
        assert got == expected, f"seed {seed}: {got} != {expected}"


def test_pii_scrub(spark):
    """PII redaction (operators/pii.py): sequential class semantics
    (an email's digits are one email, not also an account number),
    multiple matches per doc, clean docs untouched, zero-shuffle plan."""
    from scylla_cdc_rust_spark.operators.pii import pii_scrub

    rows = [
        (1, "mail a@b.com and c.d+x@e.org end"),
        (2, "node 10.0.0.1 peer 192.168.255.7"),
        (3, "acct 123456789 ref 900000000012"),
        (4, "user123456789@host.com only"),   # 9 digits INSIDE an email
        (5, "plain text no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_longnums"]) == (2, 0, 0)
    assert out[1]["text"] == "mail <EMAIL> and <EMAIL> end"
    assert (out[2]["n_ips"], out[2]["n_emails"]) == (2, 0)
    assert out[2]["text"] == "node <IP> peer <IP>"
    assert (out[3]["n_longnums"], out[3]["n_ips"]) == (2, 0)
    assert out[3]["text"] == "acct <NUM> ref <NUM>"
    # sequential semantics: the email is scrubbed first, so its digit
    # run never reaches the account-number pass
    assert (out[4]["n_emails"], out[4]["n_longnums"]) == (1, 0)
    assert out[4]["text"] == "user<EMAIL> only" or out[4]["text"] == "<EMAIL> only"
    assert out[5]["text"] == rows[4][1] and out[5]["n_emails"] == 0

    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # in-place scrub preserves the input column ORDER (positional
    # consumers), counts append at the end; pre-existing count columns
    # raise instead of duplicating the name
    assert pii_scrub(df).columns == ["doc_id", "text", "n_emails", "n_ips",
                                     "n_longnums"]
    with pytest.raises(ValueError, match="n_emails"):
        pii_scrub(df.withColumn("n_emails", F.lit(0)))


def test_fold_plan_partial_aggregation(spark):
    """The replay fold's hot path must combine map-side: every Exchange
    in the fold plan sits above a partial HashAggregate (partial_max_by
    / partial_max), so a hot key costs one aggregate buffer per task
    instead of shuffling its raw events (the reference serializes hot
    streams on one consumer; we must not)."""
    from scylla_cdc_rust_spark.functions.decode import decode
    from scylla_cdc_rust_spark.operators.fold import fold

    t0 = 1_600_000_000_000
    log = spark.createDataFrame(
        [("s", t0 + i, 0, 0, 2, None, str(i % 5), [i], 1, "w")
         for i in range(50)],
        "`cdc$stream_id` string, cdc_time_ms long, cdc_time_seq long,"
        " `cdc$batch_seq_no` int, `cdc$operation` int, `cdc$ttl` long,"
        " doc_id string, tokens array<int>, n_tok int, source string",
    )
    plan = fold(
        decode(log), collection_modes={"tokens": "list"}
    )._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan
    # the partial aggregate must appear BEFORE (below) the exchange
    assert plan.index("Exchange") < plan.index("partial_max_by")


def test_funnel_and_changelog_plan_shapes(spark, docs, tmp_path):
    """Round-4 plan pins: the curation funnel's single-pass accounting
    reads the corpus parquet exactly ONCE per side (2 FileScans total,
    vs one per .count() in the naive form), and the snapshot-changelog
    diff has no join and exactly one exchange (tagged-union aggregate,
    nothing on the snapshot sides)."""
    from scylla_cdc_rust_spark.operators.sampling import sample_hash
    from scylla_cdc_rust_spark.plans.curation import curation_funnel

    is_bench = sample_hash("doc_id", 16) == 0
    plan = curation_funnel(
        docs.where(~is_bench), benchmark=docs.where(is_bench),
        quality_min=0.3, contamination_max=0.05, ngram_n=3,
        sample_rates={"en": 0.5}, default_rate=0.8,
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 2
    import re
    assert not re.search(r"SortMergeJoin|ShuffledHashJoin", plan)

    from scylla_cdc_rust_spark.operators.merge import ParquetMergeTable
    from scylla_cdc_rust_spark.operators.fold import fold_delta

    t0 = 1_600_000_000_000
    log = spark.createDataFrame(
        [("s", t0 + i, 0, 0, 2, None, str(i % 7), [i], 1, "w")
         for i in range(40)],
        "`cdc$stream_id` string, cdc_time_ms long, cdc_time_seq long,"
        " `cdc$batch_seq_no` int, `cdc$operation` int, `cdc$ttl` long,"
        " doc_id string, tokens array<int>, n_tok int, source string",
    )
    from scylla_cdc_rust_spark.functions.decode import decode

    t = ParquetMergeTable(spark, str(tmp_path / "t"), num_buckets=4)
    dec = decode(log)
    t.merge(fold_delta(dec.where(F.col("cdc_time_ms") < t0 + 20),
                       collection_modes={"tokens": "list"}),
            collection_modes={"tokens": "list"})
    t.merge(fold_delta(dec.where(F.col("cdc_time_ms") >= t0 + 20),
                       collection_modes={"tokens": "list"}),
            collection_modes={"tokens": "list"})
    ch = t.read_changes(1, 2)
    cplan = ch._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in cplan
    assert cplan.count("Exchange") == 1


def test_image_audio_codecs_pure():
    """Numpy-only codec edge cases (no Spark): PPM header comments, BMP
    row padding across widths, bottom-up order, WAV chunk walking."""
    import numpy as np

    from scylla_cdc_rust_spark.operators.multimodal import (
        decode_bmp,
        decode_image,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
        nearest_resize,
    )

    rng = np.random.default_rng(7)
    # BMP: widths 1..8 exercise every row-padding residue (w*3 mod 4)
    for w in range(1, 9):
        px = rng.integers(0, 256, size=(5, w, 3), dtype=np.uint8)
        np.testing.assert_array_equal(decode_bmp(encode_bmp(px)), px)
        np.testing.assert_array_equal(decode_ppm(encode_ppm(px)), px)
    # PPM with comment lines in the header still decodes
    px = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    body = encode_ppm(px)
    commented = b"P6\n# a comment\n4 3\n# more\n255\n" + body.split(b"255\n", 1)[1]
    np.testing.assert_array_equal(decode_ppm(commented), px)
    # magic sniffing + honest failure for compressed formats
    np.testing.assert_array_equal(decode_image(encode_bmp(px)), px)
    with pytest.raises(NotImplementedError, match="PIL|codec"):
        decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(ValueError):
        decode_image(b"GIF89a....")
    # WAV round-trip + tolerance of an extra chunk between fmt and data
    s = (rng.integers(-30000, 30000, size=64)).astype(np.int16)
    wav = encode_wav(s, 22050)
    dec, rate = decode_wav(wav)
    assert rate == 22050 and dec.shape == (64, 1)
    np.testing.assert_array_equal(dec[:, 0], s)
    fmt_end = wav.index(b"data")
    extra = wav[:fmt_end] + b"LIST" + (4).to_bytes(4, "little") + b"INFO" + wav[fmt_end:]
    # RIFF size field is now stale, but the chunk walk must not care
    dec2, rate2 = decode_wav(extra)
    np.testing.assert_array_equal(dec2, dec)
    # nearest_resize: identity at same size; exact floor mapping
    np.testing.assert_array_equal(nearest_resize(px, 4, 3), px)
    r = nearest_resize(px, 2, 2)
    np.testing.assert_array_equal(r[0, 0], px[0, 0])
    np.testing.assert_array_equal(r[1, 1], px[(1 * 3) // 2, (1 * 4) // 2])


def test_token_ngram_contamination(spark):
    """Decontamination over pre-tokenized sequences (the target-table
    shape): token 3-gram overlap, short docs contribute nothing, both
    hash families select the same sets on a collision-free corpus."""
    from scylla_cdc_rust_spark.operators.decontam import (
        token_ngram_contamination,
    )

    corpus = spark.createDataFrame(
        [(1, [1, 2, 3, 4]), (2, [9, 9, 9]), (3, [1, 2]), (4, None)],
        "doc_id long, tokens array<int>",
    )
    bench = spark.createDataFrame(
        [(100, [2, 3, 4, 5])], "doc_id long, tokens array<int>"
    )
    for impl in ("portable", "xxhash64"):
        rows = {
            r["doc_id"]: (r["n_ngrams"], r["n_contaminated"], r["contamination"])
            for r in token_ngram_contamination(
                corpus, bench, n=3, hash_impl=impl
            ).collect()
        }
        # doc1 grams {(1,2,3),(2,3,4)} ∩ bench {(2,3,4),(3,4,5)} = 1;
        # doc2 has no overlap, doc3 too short, doc4 null → absent
        assert rows == {1: (2, 1, 0.5)}, (impl, rows)


def test_no_computed_array_in_filter_nodes(spark, docs):
    """Pin the round-5 explode fix: Catalyst's InferFiltersFromGenerate
    used to push a size>0 filter whose alias re-expansion rebuilt the
    whole gram/shingle array inside the scan-stage Filter (serial on
    single-file inputs, duplicated everywhere).  explode_nonnull must
    keep higher-order array builds OUT of every Filter node — they may
    appear only in Project/Generate."""
    from scylla_cdc_rust_spark.operators.decontam import ngram_contamination
    from scylla_cdc_rust_spark.operators.dedup_docs import (
        minhash_signatures,
        simhash_near_dups,
    )
    from scylla_cdc_rust_spark.operators.sampling import sample_hash

    is_bench = sample_hash("doc_id", 16) == 0
    frames = [
        ngram_contamination(docs.where(~is_bench), docs.where(is_bench), n=3),
        ngram_contamination(
            docs.where(~is_bench), docs.where(is_bench), n=3,
            hash_impl="xxhash64",
        ),
        minhash_signatures(docs),
        simhash_near_dups(docs.where(F.col("doc_id") < 40)),
    ]
    for df in frames:
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            stripped = line.lstrip(" +-*():0123456789")
            if stripped.startswith("Filter") or stripped.startswith("PhotonFilter"):
                assert "lambdafunction" not in line, line[:300]


# ---------------------------------------------------------------------------
# Round-5: chunking / vocab / mixture resampling
# ---------------------------------------------------------------------------


def _tok_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, tokens array<int>")


def test_chunk_tokens_windows(spark):
    from scylla_cdc_rust_spark.operators.chunking import chunk_tokens

    df = _tok_df(
        spark,
        [
            ("a", list(range(10))),   # 1 chunk (fits)
            ("b", list(range(8, 0, -1))[:8]),  # exactly max_len
            ("c", list(range(20))),   # straddles: chunks at 0,6,12
            ("d", []),                # empty -> no chunks
        ],
    )
    out = {
        (r.doc_id, r.chunk_idx): r
        for r in chunk_tokens(df, max_len=8, stride=6).collect()
    }
    assert sorted(out) == [
        ("a", 0), ("a", 1), ("b", 0), ("c", 0), ("c", 1), ("c", 2)
    ]
    assert out[("a", 0)].chunk_tokens == list(range(8))
    assert out[("a", 1)].chunk_tokens == [6, 7, 8, 9]
    assert out[("b", 0)].n_chunk_tok == 8
    c2 = out[("c", 2)]
    assert c2.start_off == 12 and c2.chunk_tokens == list(range(12, 20))
    # overlap invariant: consecutive chunks share max_len - stride tokens
    assert out[("c", 0)].chunk_tokens[6:] == out[("c", 1)].chunk_tokens[:2]


def test_chunk_tokens_disjoint_covers_everything(spark):
    from scylla_cdc_rust_spark.operators.chunking import chunk_tokens

    df = _tok_df(spark, [("x", list(range(23)))])
    rows = sorted(
        chunk_tokens(df, max_len=5).collect(), key=lambda r: r.chunk_idx
    )
    flat = [t for r in rows for t in r.chunk_tokens]
    assert flat == list(range(23))  # default stride = max_len, no gaps
    assert [r.n_chunk_tok for r in rows] == [5, 5, 5, 5, 3]


def test_chunk_tokens_rejects_bad_stride(spark):
    from scylla_cdc_rust_spark.operators.chunking import chunk_tokens

    df = _tok_df(spark, [("x", [1, 2, 3])])
    with pytest.raises(ValueError):
        chunk_tokens(df, max_len=4, stride=5)
    with pytest.raises(ValueError):
        chunk_tokens(df, max_len=4, stride=0)


def test_chunk_digest_matches_duckdb_list_reduce(spark):
    import duckdb

    from scylla_cdc_rust_spark.operators.chunking import chunk_digest

    toks = [31999, 7, 0, 123, 456]
    df = _tok_df(spark, [("x", toks)])
    got = df.select(chunk_digest("tokens").alias("d")).first().d
    want = duckdb.sql(
        f"select list_reduce({toks}::BIGINT[], (a,b) -> (a*31+b) % 1000000007)"
    ).fetchone()[0]
    assert got == want


def test_vocab_topk_counts_and_ties(spark):
    from scylla_cdc_rust_spark.operators.vocab import vocab_topk

    df = _tok_df(
        spark,
        [
            ("a", [1, 1, 2, 3]),
            ("b", [1, 2, 2]),
            ("c", [3]),
        ],
    )
    rows = vocab_topk(df, k=2).collect()
    assert [(r.rank, r.token, r.n_occurrences, r.n_docs) for r in rows] == [
        (1, 1, 3, 2),  # 3 occurrences across docs a,b
        (2, 2, 3, 2),  # tie on occurrences -> token asc
    ]


def test_mixture_thresholds_integer_math():
    from scylla_cdc_rust_spark.operators.sampling import mixture_thresholds

    # counts 100/50, weights 1:1 -> T = 100, keep 50 each:
    # src_a keeps 50/100 (thresh 500000), src_b keeps 50/50 (1000000)
    th = mixture_thresholds({"a": 100, "b": 50}, {"a": 1, "b": 1})
    assert th == {"a": 500_000, "b": 1_000_000}
    # infeasible stratum errors
    with pytest.raises(ValueError):
        mixture_thresholds({"a": 10}, {"a": 1, "b": 1})
    with pytest.raises(ValueError):
        mixture_thresholds({"a": 10}, {"a": 0})


def test_mixture_sample_achieves_mixture(spark, docs):
    from scylla_cdc_rust_spark.operators.sampling import mixture_sample

    out = mixture_sample(
        docs, {"src0": 3, "src1": 1}, strata_col="source"
    )
    counts = {r.source: r.cnt for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert set(counts) <= {"src0", "src1"}  # unlisted strata dropped
    # 25 docs per source: 3:1 is infeasible beyond T=33 -> src0 targets
    # 24(ish), src1 8(ish); hash thresholding is approximate at row
    # granularity, so assert the ratio loosely and determinism exactly
    again = mixture_sample(docs, {"src0": 3, "src1": 1}, strata_col="source")
    assert sorted(r.doc_id for r in out.select("doc_id").collect()) == sorted(
        r.doc_id for r in again.select("doc_id").collect()
    )
    assert counts.get("src0", 0) > counts.get("src1", 0)


def test_contamination_spans_merge_and_bounds(spark):
    from scylla_cdc_rust_spark.operators.decontam import contamination_spans

    # benchmark contributes grams (1,2,3) and (7,8,9); the separator 99
    # never appears in the corpus, so its boundary grams cannot hit
    bench = _tok_df(spark, [("b", [1, 2, 3, 99, 7, 8, 9])])
    corpus = _tok_df(
        spark,
        [
            # hits at pos 2 (1,2,3) and pos 5 (7,8,9): token intervals
            # [2,5) and [5,8) TOUCH (gap == n) -> ONE span over [2,8)
            ("x", [9, 9, 1, 2, 3, 7, 8, 9]),
            # two far-apart hits -> two spans of 3 tokens each
            ("y", [1, 2, 3] + [0] * 10 + [7, 8, 9]),
            # no hits -> absent from output
            ("z", [4, 5, 6]),
        ],
    )
    rows = {r.doc_id: r for r in contamination_spans(corpus, bench, n=3).collect()}
    assert set(rows) == {"x", "y"}
    x = rows["x"]
    assert (x.n_spans, x.max_span_tok, x.covered_tok) == (1, 6, 6)
    y = rows["y"]
    assert (y.n_spans, y.max_span_tok, y.covered_tok) == (2, 3, 6)


def test_duplicate_spans_semantics(spark):
    from scylla_cdc_rust_spark.operators.decontam import duplicate_spans

    corpus = _tok_df(
        spark,
        [
            # a and b share the 5-token run (1,2,3,4,5) -> grams at a:pos0,
            # b:pos2; each covers 5 tokens in its own document
            ("a", [1, 2, 3, 4, 5, 50, 51, 52]),
            ("b", [40, 41, 1, 2, 3, 4, 5]),
            # c and d share TWO runs far apart -> two spans for c
            ("c", [6, 7, 8, 9, 10] + [0] * 10 + [11, 12, 13, 14, 15]),
            ("d", [6, 7, 8, 9, 10]),
            ("e", [11, 12, 13, 14, 15]),
            # f repeats a run only WITHIN itself -> cross-doc test excludes it
            ("f", [20, 21, 22, 23, 24, 99, 20, 21, 22, 23, 24]),
            # g is unique -> absent
            ("g", [30, 31, 32, 33, 34, 35]),
        ],
    )
    rows = {r.doc_id: r for r in duplicate_spans(corpus, n=5).collect()}
    assert set(rows) == {"a", "b", "c", "d", "e"}
    assert (rows["a"].n_spans, rows["a"].covered_tok) == (1, 5)
    assert (rows["b"].n_spans, rows["b"].covered_tok) == (1, 5)
    assert (rows["c"].n_spans, rows["c"].max_span_tok, rows["c"].covered_tok) == (
        2, 5, 10,
    )
    # zero-token-gap adjacency merges: x and y share a 6-token run ->
    # two overlapping gram hits (pos 0, 1) union into ONE 6-token span
    corpus2 = _tok_df(
        spark,
        [("x", [1, 2, 3, 4, 5, 6]), ("y", [1, 2, 3, 4, 5, 6, 70])],
    )
    rows2 = {r.doc_id: r for r in duplicate_spans(corpus2, n=5).collect()}
    assert (rows2["x"].n_spans, rows2["x"].max_span_tok) == (1, 6)


def test_duplicate_spans_shares_one_gram_shuffle(spark, tmp_path):
    """The gram stream must cross the wire ONCE and the corpus be scanned
    ONCE: the ≥2-docs test runs as window min/max over Exchange(h), not
    as the groupBy+self-join topology whose two gram-stream consumers
    each rescan and reshuffle their own copy (2 scans + 2 wide
    exchanges measured before the rewrite)."""
    import re

    from scylla_cdc_rust_spark.operators.decontam import duplicate_spans

    _tok_df(
        spark, [(str(i), [i % 7, 2, 3, 4, 5, i]) for i in range(64)]
    ).write.parquet(str(tmp_path / "corpus"))
    out = duplicate_spans(spark.read.parquet(str(tmp_path / "corpus")), n=5)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    # AQE's toString appends the pre-execution plan after the final one
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("FileScan") == 1, plan
    assert len(re.findall(r"Generate posexplode", plan)) == 1, plan
    # gram exchange (h) + span window exchange (id) and nothing else
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2, plan
    assert "Join" not in plan, plan


def test_gram_cosine_pairs_matches_expression_join(spark, embs):
    """gram_cosine_pairs (per-bucket BLAS gram, the emb_neardup_clusters
    hot stage since r6) must emit exactly the pair set of the per-pair
    expression join it replaced, and its plan must be the grouped-Arrow
    shape — one FlatMapGroupsInPandas, no join of the vector frame."""
    from scylla_cdc_rust_spark.operators.ann import (
        _as_double,
        cosine,
        gram_cosine_pairs,
        lsh_bucket,
    )

    b = embs.select(
        "vec_id",
        _as_double(F.col("embedding")).alias("v"),
        lsh_bucket("embedding", 64, n_planes=3).alias("bucket"),
        F.sqrt(
            F.aggregate(
                _as_double(F.col("embedding")),
                F.lit(0.0),
                lambda a, x: a + x * x,
            )
        ).alias("norm"),
    )
    # plant exact dups so the ≥ threshold branch is exercised
    b = b.unionByName(
        b.where(F.col("vec_id") % 7 == 0).withColumn(
            "vec_id", F.col("vec_id") + 10_000
        )
    )
    fast = gram_cosine_pairs(b, threshold=0.99)
    x, y = b.alias("x"), b.alias("y")
    slow = (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .where(F.round(cosine(F.col("x.v"), F.col("y.v")), 4) >= 0.99)
        .select(F.col("x.vec_id").alias("d1"), F.col("y.vec_id").alias("d2"))
    )
    got = {(r["d1"], r["d2"]) for r in fast.collect()}
    want = {(r["d1"], r["d2"]) for r in slow.collect()}
    assert got == want and len(got) > 0
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan


def test_lsh_star_edges_equivalent_components(spark, docs):
    """minhash_lsh_star_edges (the doc_dedup_clusters_lsh edge feed
    since r6) must produce the same connected components as the full
    m²-per-bucket candidate pairs: each bucket is a clique, and the
    member → bucket-min star captures exactly its connectivity."""
    from scylla_cdc_rust_spark.operators.dedup_docs import (
        dedup_clusters,
        minhash_lsh_candidates,
        minhash_lsh_star_edges,
        minhash_signatures,
        release_guard_caches,
    )

    near = docs.limit(4).select(
        (F.col("doc_id") + 500_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    corpus = docs.unionByName(near)
    sigs = minhash_signatures(corpus, num_hashes=8)
    via_pairs = dedup_clusters(
        minhash_lsh_candidates(sigs, num_hashes=8, bands=4)
    )
    release_guard_caches()
    via_stars = dedup_clusters(
        minhash_lsh_star_edges(sigs, num_hashes=8, bands=4)
    )
    release_guard_caches()
    a = {(r["d1"], r["cluster_id"]) for r in via_pairs.collect()}
    b = {(r["d1"], r["cluster_id"]) for r in via_stars.collect()}
    assert a == b and len(a) > 0
    # the star feed must never materialize a within-bucket self-join
    plan = minhash_lsh_star_edges(sigs)._jdf.queryExecution().executedPlan().toString()
    release_guard_caches()
    assert "Generate" in plan  # banding explode present
