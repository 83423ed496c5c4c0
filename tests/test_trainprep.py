"""Training-data prep operator tests (dedup / similarity / textstats /
multimodal) on the driver-generated documents+embeddings tables at
sf0.001, plus synthetic corner cases."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_prepper_spark.trainprep import dedup, multimodal, similarity, textstats

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


# ------------------------------------------------------------- textstats

def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "Hello, World! 42"), (2, "   "), (3, "a-b c")], "id int, text string"
    )
    out = df.select(
        "id",
        textstats.token_count(F.col("text")).alias("tc"),
        textstats.ws_token_count(F.col("text")).alias("wc"),
    )
    r = {x["id"]: (x["tc"], x["wc"]) for x in out.collect()}
    assert r[1] == (3, 3)
    assert r[2] == (0, 0)
    assert r[3] == (3, 2)


def test_quality_and_langid(docs):
    out = textstats.quality_features(docs.limit(50))
    rows = out.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)
    lid = textstats.lang_id(docs.limit(50)).collect()
    assert all(r["lang_pred"] in ("en", "de", "fr", "es", "und") for r in lid)


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, "fox the quick THE"), (3, "other words")],
        "id int, text string",
    )
    fp = {r["id"]: r["fingerprint"] for r in textstats.fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


# ----------------------------------------------------------------- dedup

def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (5, "same text"), (3, "unique")], "doc_id long, text string"
    )
    out = dedup.exact_dedup(df, "doc_id", "text").collect()
    m = {r["keep_id"]: r["n_copies"] for r in out}
    assert m == {1: 2, 3: 1}


def test_token_hash60_matches_duckdb(spark):
    import duckdb

    words = ["alpha", "beta", "gamma", "δunicode"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        r["w"]: r["h"]
        for r in df.select("w", dedup.token_hash60(F.col("w")).alias("h")).collect()
    }
    con = duckdb.connect()
    for w in words:
        (exp,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [w]
        ).fetchone()
        assert got[w] == exp, w


def _near_dup_df(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy")
    other = "completely different content about spark indexes and queries " * 5
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], "doc_id long, text string"
    )


def test_jaccard_pairs(spark):
    df = _near_dup_df(spark)
    out = dedup.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in out.collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_pairs(spark):
    df = _near_dup_df(spark)
    out = dedup.minhash_lsh_pairs(df, "doc_id", "text", n=3, num_perm=16, bands=8, threshold=0.5)
    pairs = {(r["doc_a"], r["doc_b"]) for r in out.collect()}
    assert (1, 2) in pairs
    assert not any(4 in p for p in pairs)
    # verified output must be a subset of the exact-jaccard pairs
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
    }
    assert pairs <= exact


def test_simhash(spark):
    df = _near_dup_df(spark)
    sigs = {r["doc"]: r["simhash"] for r in dedup.simhash_signatures(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]
    assert bin(sigs[1] ^ sigs[3]).count("1") < bin(sigs[1] ^ sigs[4]).count("1")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_pairs(df, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0


# ------------------------------------------------------------ similarity

@pytest.fixture(scope="module")
def queries(spark, emb):
    return (
        emb.filter(F.col("vec_id") < 3)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )


def test_brute_topk_self_is_top1(emb, queries):
    out = similarity.brute_topk(emb, queries, k=3).collect()
    top1 = {r["query_id"]: r["vec_id"] for r in out if r["rank"] == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}
    for r in out:
        if r["rank"] == 1:
            assert r["cos"] == pytest.approx(1.0, abs=1e-5)


def test_brute_topk_matches_numpy(emb, queries):
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    out = similarity.brute_topk(emb, queries, k=5).collect()
    for qid in [0, 1, 2]:
        q = vecs[qid]
        sims = {
            vid: round(float(v @ q / (np.linalg.norm(v) * np.linalg.norm(q))), 6)
            for vid, v in vecs.items()
        }
        exp = sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = sorted(
            [(r["vec_id"], r["cos"]) for r in out if r["query_id"] == qid],
            key=lambda t: (-t[1], t[0]),
        )
        assert [v for v, _ in got] == [v for v, _ in exp]


def test_lsh_topk_subset_quality(emb, queries):
    out = similarity.lsh_topk(emb, queries, k=3, n_planes=6)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    top1 = {r["query_id"]: r["vec_id"] for r in rows if r["rank"] == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}  # identical vector shares the bucket


def test_ivf_topk(emb, queries):
    cents = similarity.ivf_build(emb)
    n_cells = emb.select("label").distinct().count()
    assert cents.count() == n_cells
    # probing ALL cells makes IVF exhaustive → must equal brute force
    out = similarity.ivf_topk(emb, queries, cents, k=3, n_probe=n_cells).collect()
    brute = similarity.brute_topk(emb, queries, k=3).collect()
    key = lambda rows: sorted((r["query_id"], r["rank"], r["vec_id"], r["cos"]) for r in rows)
    assert key(out) == key(brute)
    # partial probe returns a (possibly smaller-coverage) valid ranking
    part = similarity.ivf_topk(emb, queries, cents, k=3, n_probe=1).collect()
    assert {r["query_id"] for r in part} == {0, 1, 2}
    assert all(r["rank"] <= 3 for r in part)


def test_cosine_pairs_blocked(emb):
    out = similarity.cosine_pairs(emb.limit(100), threshold=0.9, block_col="label")
    for r in out.collect():
        assert r["id_a"] < r["id_b"] and r["cos"] >= 0.9


# ------------------------------------------------------------ multimodal

def test_multimodal_plumbing(spark):
    df = (
        spark.range(20)
        .select(
            F.col("id").alias("media_id"),
            F.when(F.col("id") % 2 == 0, "image").otherwise("video").alias("kind"),
            F.encode(F.concat(F.lit("payload-"), F.col("id").cast("string")), "utf-8").alias(
                "payload"
            ),
            F.lit("application/octet-stream").alias("mime"),
        )
    )
    df = multimodal.attach_metadata(df)
    rows = df.collect()
    assert all(r["n_bytes"] == len(bytes(r["payload"])) for r in rows)
    feats = multimodal.extract_features(df, fake=True, feature_dim=8)
    got = feats.collect()
    assert len(got) == 20
    assert all(len(r["feature"]) == 8 for r in got)
    # deterministic: second run bit-identical
    again = {r["media_id"]: r["feature"] for r in multimodal.extract_features(df, fake=True, feature_dim=8).collect()}
    for r in got:
        assert again[r["media_id"]] == r["feature"]
    planned = multimodal.frame_sample_plan(feats, every_n=10)
    for r in planned.collect():
        assert r["sample_frames"][0] == 0
        assert all(f < r["n_frames"] for f in r["sample_frames"])


def test_decode_real_rejects_unknown_signature():
    """fake=False is the REAL header-decode boundary now: unknown
    signatures raise (→ DLQ route), known containers decode."""
    with pytest.raises(ValueError):
        multimodal.decode_stub(b"xx", "image", fake=False)
    from data_prepper_spark.trainprep import mediadecode as md

    d = multimodal.decode_stub(md.make_png(64, 32), "image", fake=False)
    assert (d["width"], d["height"], d["format"]) == (64, 32, "png")


def test_extract_features_real_decode(spark):
    from data_prepper_spark.trainprep import mediadecode as md

    payloads = [
        (0, "image", md.make_png(640, 480)),
        (1, "image", md.make_jpeg(123, 77, exif=True)),
        (2, "image", md.make_gif(320, 200, n_frames=9)),
        (3, "audio", md.make_wav(800, channels=2, sample_rate=44100)),
    ]
    df = multimodal.attach_metadata(
        spark.createDataFrame(
            [(m, k, p, "application/octet-stream") for m, k, p in payloads],
            "media_id long, kind string, payload binary, mime string",
        )
    )
    got = {r["media_id"]: r
           for r in multimodal.extract_features(df, fake=False).collect()}
    assert (got[0]["width"], got[0]["height"], got[0]["format"]) == \
        (640, 480, "png")
    assert got[1]["exif_present"] is True and got[1]["format"] == "jpeg"
    assert (got[2]["n_frames"], got[2]["format"]) == (9, "gif")
    assert (got[3]["n_frames"], got[3]["channels"],
            got[3]["sample_rate"]) == (800, 2, 44100)
    assert got[3]["width"] is None


# --------------------------------------------------- round-2 scale shapes

def test_jaccard_prefix_filter_lossless(spark):
    """Prefix-filtered blocking returns EXACTLY the unblocked answer."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "a completely different document about spark sql"),
        (4, "the quick brown fox jumps over the lazy dog"),
        (5, "spark sql is a completely different document about"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    for n, t in ((1, 0.5), (2, 0.3), (3, 0.6)):
        fast = dedup.jaccard_pairs(df, "doc_id", "text", n=n, threshold=t)
        slow = dedup.jaccard_pairs(
            df, "doc_id", "text", n=n, threshold=t, prefix_filter=False
        )
        key = lambda r: (r["doc_a"], r["doc_b"], r["jaccard"])
        assert sorted(map(key, fast.collect())) == sorted(map(key, slow.collect()))


def test_minhash_lsh_oracle_hashes_verified_exact(spark):
    """Both hash families' outputs are exactly-verified: every emitted
    pair's jaccard matches the exact pairwise value, and identical docs
    (which collide in every band under ANY hash) always surface."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(4)] + [
        (10, "one two three four five six seven eight"),
        (11, "one two three four five six seven nine"),
        (20, "totally unrelated content goes right here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(
            df, "doc_id", "text", n=2, threshold=0.4, prefix_filter=False
        ).collect()
    }
    for oh in (False, True):
        got = dedup.minhash_lsh_pairs(
            df, "doc_id", "text", n=2, num_perm=8, bands=4, threshold=0.4,
            oracle_hashes=oh,
        ).collect()
        for r in got:
            assert exact[(r["doc_a"], r["doc_b"])] == r["jaccard"]
        pairs = {(r["doc_a"], r["doc_b"]) for r in got}
        for a in range(4):
            for b in range(a + 1, 4):
                assert (a, b) in pairs  # identical docs always collide


def test_brute_topk_partition_invariant(emb, queries):
    """Two-stage top-k is exact under any input partitioning."""
    base = similarity.brute_topk(emb, queries, k=4).collect()
    shuffled = similarity.brute_topk(emb.repartition(7), queries, k=4).collect()
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"], r["cos"])
    assert sorted(map(key, base)) == sorted(map(key, shuffled))


# ---------------------------------------------- round-2 LLM-pipeline ops

def test_repetition_features(spark):
    rows = [
        (1, "spam spam spam spam"),                       # one dominant 2-gram
        (2, "all words here are completely distinct ok"), # no repetition
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    r = {x["doc"]: x for x in textstats.repetition_features(df).collect()}
    # doc 1: top 2-gram "spam spam" (len 9) occurs 3x over 19 chars
    assert r[1]["top_ngram_char_frac"] == round(3 * 9 / 19, 6)
    assert r[2]["dup_ngram_char_frac"] == 0.0
    assert r[2]["top_ngram_char_frac"] > 0  # a (unique) top 2-gram still exists


def test_ngram_overlap_decontam(spark):
    from data_prepper_spark.trainprep.decontam import ngram_overlap

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "a completely unrelated training document about spark"),
            (3, "short"),
        ],
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy dog and more words here")],
        "doc_id int, text string",
    )
    out = {r["doc"]: (r["n_hits"], r["contaminated"]) for r in
           ngram_overlap(train, bench, n=8).collect()}
    assert out[1][1] is True and out[1][0] >= 1
    assert out[2] == (0, False)
    assert out[3] == (0, False)  # < n tokens -> no grams, still in output


def test_stratified_sample_deterministic(spark):
    from data_prepper_spark.trainprep.decontam import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)], "id long, s string"
    )
    out1 = stratified_sample(df, "s", {"a": 0.5, "b": 0.1}, key_col="id")
    out2 = stratified_sample(df.repartition(13), "s", {"a": 0.5, "b": 0.1}, key_col="id")
    ids1 = sorted(r["id"] for r in out1.collect())
    assert ids1 == sorted(r["id"] for r in out2.collect())  # partition-invariant
    na = sum(1 for r in out1.collect() if r["s"] == "a")
    nb = out1.count() - na
    assert 400 < na < 600 and 50 < nb < 150  # ~50% of 1000, ~10% of 1000


def test_knn_filtered(emb, queries):
    """knn filter semantics: pre-filter yields full k from the allowed
    subset; post-filter subsets the unfiltered top-k keeping original
    rank positions; they diverge whenever an allowed vector sits
    outside the global top-k (similarity.knn_filtered)."""
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    labels = {r["vec_id"]: r["label"] for r in emb.collect()}
    allowed = sorted({v for v in labels.values()})[:2]
    k = 4

    def sims(qid):
        q = vecs[qid]
        return {
            vid: round(float(v @ q
                             / (np.linalg.norm(v) * np.linalg.norm(q))), 6)
            for vid, v in vecs.items()
        }

    pre = similarity.knn_filtered(
        emb, queries, "label", allowed, k=k, mode="pre").collect()
    post = similarity.knn_filtered(
        emb, queries, "label", allowed, k=k, mode="post").collect()
    for qid in [0, 1, 2]:
        s = sims(qid)
        want_pre = sorted(
            ((v, c) for v, c in s.items() if labels[v] in allowed),
            key=lambda kv: (-kv[1], kv[0]))[:k]
        got_pre = sorted(
            [(r["vec_id"], r["cos"]) for r in pre if r["query_id"] == qid],
            key=lambda t: (-t[1], t[0]))
        assert [v for v, _ in got_pre] == [v for v, _ in want_pre], qid
        glob = sorted(s.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        want_post = [(v, c) for v, c in glob if labels[v] in allowed]
        got_post = sorted(
            [(r["vec_id"], r["cos"]) for r in post if r["query_id"] == qid],
            key=lambda t: (-t[1], t[0]))
        assert [v for v, _ in got_post] == [v for v, _ in want_post], qid
        # post keeps unfiltered rank positions
        glob_rank = {v: i + 1 for i, (v, _) in enumerate(glob)}
        for r in post:
            if r["query_id"] == qid:
                assert r["rank"] == glob_rank[r["vec_id"]], qid
        # post never exceeds pre's depth
        assert len(got_post) <= len(got_pre)
    import pytest as _pt

    with _pt.raises(ValueError):
        similarity.knn_filtered(emb, queries, "label", allowed, mode="nope")
