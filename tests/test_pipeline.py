"""Pipeline-operator tests: dedup families, similarity search, text
analysis, multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from dqx_spark.pipeline import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog and runs away fast tonight"),
        (1, "the quick brown fox jumps over the lazy dog and runs away fast today"),  # near-dup of 0
        (2, "der schnelle braune fuchs springt über den faulen hund und rennt weg"),
        (3, "completely different content about spark dataframes and shuffle partitions here"),
        (4, "the quick brown fox jumps over the lazy dog and runs away fast tonight"),  # exact dup of 0
        (5, ""),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def test_exact_duplicates(docs):
    out = dedup.exact_duplicates(docs, "id", text_col="text")
    flags = {r["id"]: r["is_duplicate"] for r in out.collect()}
    assert flags[0] and flags[4]
    assert not flags[1] and not flags[3]
    kept = dedup.drop_exact_duplicates(docs, "id", text_col="text")
    ids = {r["id"] for r in kept.select("id").collect()}
    assert 0 in ids and 4 not in ids
    assert len(ids) == 5


def test_ngram_jaccard_pairs(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "id", "text", k=3, threshold=0.5).collect()
    pairset = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 4) in pairset  # identical
    assert (0, 1) in pairset  # near-dup
    assert all(p[1] != 3 and p[0] != 3 for p in pairset)
    exact = [r for r in pairs if (r["id_a"], r["id_b"]) == (0, 4)][0]
    assert exact["jaccard"] == 1.0


def test_ngram_jaccard_candidate_budget(docs):
    from dqx_spark.errors import ComputationError

    # generous budget: runs normally
    ok = dedup.ngram_jaccard_pairs(docs, "id", "text", k=3, threshold=0.5, max_candidate_pairs=10**6)
    assert ok.count() > 0
    # budget of 1 candidate pair: the shared-shingle bound (docs 0/1/4 share
    # most shingles) exceeds it, so the guard fails loudly BEFORE the
    # self-join, naming the mitigation knobs
    with pytest.raises(ComputationError, match="max_candidate_pairs"):
        dedup.ngram_jaccard_pairs(docs, "id", "text", k=3, threshold=0.5, max_candidate_pairs=1)


def test_minhash_lsh(docs):
    pairs = dedup.minhash_lsh_pairs(docs, "id", "text", num_hashes=64, bands=16, shingle_k=3, threshold=0.5)
    pairset = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in pairs.collect()}
    assert pairset[(0, 4)] == 1.0  # identical docs always collide
    assert (0, 1) in pairset  # near-dup should be found at jaccard ~0.8


def test_simhash(docs, spark):
    pairs = dedup.simhash_duplicate_pairs(docs, "id", "text", max_hamming=3)
    pairset = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert pairset[(0, 4)] == 0
    # simhash is deterministic across runs
    a = sorted(dedup.simhash64(docs, "id", "text").collect())
    b = sorted(dedup.simhash64(docs, "id", "text").collect())
    assert a == b


def test_portable_hash60_matches_md5(docs, spark):
    """The engine-portable 60-bit hash must equal int(md5_hex[:15], 16) —
    the contract that lets DuckDB oracles reproduce LSH signatures."""
    import hashlib

    out = spark.range(1).select(
        text.portable_hash60(F.lit("hello")).alias("a"),
        text.portable_hash60(F.lit("the quick brown fox")).alias("b"),
    ).collect()[0]
    assert out["a"] == int(hashlib.md5(b"hello").hexdigest()[:15], 16)
    assert out["b"] == int(hashlib.md5(b"the quick brown fox").hexdigest()[:15], 16)


def test_minhash_md5_mode_and_exact_verification(docs):
    pairs = dedup.minhash_lsh_pairs(
        docs, "id", "text", num_hashes=64, bands=16, shingle_k=3, threshold=0.5,
        hash_name="md5", verify_exact=True,
    )
    rows = {(r["id_a"], r["id_b"]): r for r in pairs.collect()}
    assert rows[(0, 4)]["est_jaccard"] == 1.0
    assert rows[(0, 4)]["jaccard"] == 1.0  # exact columns present and correct
    assert rows[(0, 4)]["common"] == rows[(0, 4)]["size_a"] == rows[(0, 4)]["size_b"]
    # exact verification bounds every surviving pair by the true jaccard
    assert all(r["jaccard"] >= 0.5 for r in rows.values())
    # deterministic across runs (hash-seeded, no RNG)
    again = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert set(rows) == again


def test_simhash_md5_mode(docs):
    sigs = {r["id"]: r["sh"] for r in dedup.simhash64(docs, "id", "text", hash_name="md5").collect()}
    assert all(s is None or 0 <= s < 2**60 for s in sigs.values())  # 60-bit portable signatures
    assert sigs[0] == sigs[4]
    pairs = dedup.simhash_duplicate_pairs(docs, "id", "text", max_hamming=3, hash_name="md5")
    pairset = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert pairset[(0, 4)] == 0


def test_connected_components(docs):
    groups = dedup.near_duplicate_groups(docs, "id", "text", method="ngram", threshold=0.5, k=3)
    label = {r["id"]: r["group_id"] for r in groups.collect()}
    assert label[0] == label[1] == label[4] == 0
    assert label[3] == 3 and label[2] == 2


def test_embedding_pairs_and_topk(spark):
    import math

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.7, 0.7, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "id long, vec array<double>")
    exact = dedup.embedding_cosine_pairs(df, "id", "vec", threshold=0.95, num_planes=None)
    pairs = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    assert pairs == {(0, 1)}
    lsh = dedup.embedding_cosine_pairs(df, "id", "vec", threshold=0.95, num_planes=4)
    assert (0, 1) in {(r["id_a"], r["id_b"]) for r in lsh.collect()}

    top = similarity.cosine_topk(df, [1.0, 0.0, 0.0, 0.0], "vec", "id", k=3).collect()
    assert [r["id"] for r in top] == [0, 1, 4]
    assert abs(top[2]["score"] - math.cos(math.pi / 4)) < 1e-9

    ann = similarity.ann_lsh_topk(df, [1.0, 0.0, 0.0, 0.0], "vec", "id", k=2, num_planes=4)
    assert [r["id"] for r in ann.collect()][0] == 0


def test_ann_recall_at_10_vs_exact(spark):
    """Certify the approximate indexes the way public ANN benchmarks do:
    recall@10 against the exact brute-force top-k on the driver embeddings
    table, with a floor.  Deterministic given the testdata (hash-seeded LSH,
    seeded KMeans).  Measured r6 on the driver embeddings (500 vecs,
    64-dim): LSH defaults (planes=6, multiprobe=1, 16 tables) = 0.96 at
    sf0.001; IVF (8 cells, probe 5) = 0.94 at BOTH sf0.001 and sf0.01;
    single-table LSH was 0.30 — the num_tables lever is what makes
    sign-LSH usable on unstructured embeddings.  Floors raised 0.75 -> 0.9
    (r6), matching the minhash recall floor."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    qids = [0, 7, 13, 21, 33]
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in df.where(F.col("vec_id").isin(qids)).collect()}
    exact = {
        qid: {r["id"] for r in similarity.cosine_topk(df, qv, "embedding", "vec_id", 10).collect()}
        for qid, qv in qvecs.items()
    }
    lsh_recalls = []
    for qid, qv in qvecs.items():
        got = {
            r["id"]
            # library DEFAULTS: planes=6, multiprobe=1, tables=16
            for r in similarity.ann_lsh_topk(df, qv, "embedding", "vec_id", 10).collect()
        }
        lsh_recalls.append(len(exact[qid] & got) / 10)
    assert sum(lsh_recalls) / len(lsh_recalls) >= 0.9, f"LSH recall@10 {lsh_recalls}"

    indexed, centroids = similarity.ivf_build_index(df, "embedding", "vec_id", n_centroids=8, seed=42)
    indexed = indexed.cache()
    ivf_recalls = []
    for qid, qv in qvecs.items():
        # library DEFAULT n_probe=5
        got = {r["id"] for r in similarity.ivf_topk(indexed, centroids, qv, k=10).collect()}
        ivf_recalls.append(len(exact[qid] & got) / 10)
    assert sum(ivf_recalls) / len(ivf_recalls) >= 0.9, f"IVF recall@10 {ivf_recalls}"
    df.unpersist()
    indexed.unpersist()


def test_topk_per_query(spark):
    corpus = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)], "id long, vec array<double>"
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.1, 0.0, 0.0]), (101, [0.0, 0.0, 0.1, 1.0])], "qid long, qvec array<double>"
    )
    out = similarity.cosine_topk_per_query(corpus, queries, "vec", "id", "qvec", "qid", k=1).collect()
    best = {r["query_id"]: r["id"] for r in out}
    assert best == {100: 0, 101: 3}


def test_text_metrics(spark):
    df = spark.createDataFrame(
        [
            (0, "The quick brown fox jumps over the lazy dog."),
            (1, "der die das und ist nicht ein"),
            (2, "你好世界这是一个测试文档内容"),
            (3, ""),
            (4, "le chat est sur la table et il ne veut pas descendre"),
        ],
        "id long, t string",
    )
    out = df.select(
        "id",
        text.token_count("t").alias("tc"),
        text.lang_id("t").alias("lang"),
        text.quality_score("t").alias("q"),
        text.doc_fingerprint("t").alias("fp"),
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[0]["tc"] == 9
    assert rows[0]["lang"] == "en"
    assert rows[1]["lang"] == "de"
    assert rows[2]["lang"] == "zh"
    assert rows[3]["lang"] == "und"
    assert rows[4]["lang"] == "fr"
    assert rows[3]["tc"] == 0
    assert 0 <= rows[0]["q"] <= 1
    import hashlib

    expected = hashlib.md5("the quick brown fox jumps over the lazy dog.".encode()).hexdigest()
    assert rows[0]["fp"] == expected


def test_text_profile_matches_individual_functions(spark):
    df = spark.createDataFrame(
        [
            (0, "The quick brown fox jumps over the lazy dog."),
            (1, "der die das und ist nicht ein"),
            (2, "你好世界这是一个测试文档内容"),
            (3, ""),
            (4, None),
            (5, "le chat est sur la table et il ne veut pas descendre"),
        ],
        "id long, t string",
    )
    prof = {r["id"]: r for r in text.text_profile(df, "id", "t").collect()}
    ind = {
        r["id"]: r
        for r in df.select(
            "id",
            text.token_count("t").alias("tc"),
            text.lang_id("t").alias("lang"),
            text.quality_score("t").alias("q"),
            text.stopword_ratio("t").alias("sr"),
            text.avg_token_length("t").alias("awl"),
            text.alpha_ratio("t").alias("ar"),
            text.doc_fingerprint("t").alias("fp"),
        ).collect()
    }
    for i in ind:
        p, s = prof[i], ind[i]
        assert p["token_count"] == s["tc"], i
        assert p["lang"] == s["lang"], i
        assert p["quality"] == s["q"], i
        assert round(s["sr"], 6) == p["stopword_ratio"], i
        assert round(s["awl"], 6) == p["avg_token_length"], i
        assert round(s["ar"], 6) == p["alpha_ratio"], i
        assert p["fingerprint"] == s["fp"], i


def test_parse_image_header():
    # PNG: sig + IHDR(len,type,w,h,depth=8,color=6) -> 4 channels
    png = bytes.fromhex("89504E470D0A1A0A0000000D49484452") + (320).to_bytes(4, "big") + (
        200
    ).to_bytes(4, "big") + bytes.fromhex("0806000000")
    assert multimodal.parse_image_header(png) == (320, 200, 4, "png-ihdr")
    # GIF87a: LSD width/height little-endian
    gif = b"GIF87a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little") + b"\x00\x00\x00"
    assert multimodal.parse_image_header(gif) == (640, 480, 3, "gif-lsd")
    # JPEG: SOI + APP0 segment skipped, then SOF0 with h/w/components
    app0 = bytes.fromhex("FFE00010") + b"JFIF\x00" + bytes(9)
    sof0 = bytes.fromhex("FFC0001108") + (120).to_bytes(2, "big") + (240).to_bytes(2, "big") + b"\x03"
    assert multimodal.parse_image_header(b"\xff\xd8" + app0 + sof0) == (240, 120, 3, "jpeg-sof")
    # BMP: BITMAPINFOHEADER dims (height may be negative = top-down)
    bmp = b"BM" + bytes(16) + (800).to_bytes(4, "little") + (-600).to_bytes(4, "little", signed=True)
    assert multimodal.parse_image_header(bmp) == (800, 600, None, "bmp-dib")
    # junk / None -> not an image
    assert multimodal.parse_image_header(b"not an image") is None
    assert multimodal.parse_image_header(None) is None


def test_multimodal_plumbing(spark):
    jpeg = bytes.fromhex("FFD8FF") + b"fakejpegdata" * 100
    png = bytes.fromhex("89504E47") + b"fakepngdata" * 200
    df = spark.createDataFrame([(0, jpeg), (1, png), (2, None)], "id long, content binary")

    meta = multimodal.attach_media_metadata(df, "content").collect()
    m = {r["id"]: r["media_meta"] for r in meta}
    assert m[0]["mime"] == "image/jpeg"
    assert m[1]["mime"] == "image/png"
    assert m[2]["mime"] is None
    assert m[0]["size_bytes"] == len(jpeg)

    decoded = multimodal.decode_image(df, "content", "id").collect()
    d = {r["id"]: r for r in decoded}
    assert d[0]["decode_ok"] in (True, False)  # depends on PIL availability
    assert d[2]["decode_ok"] is False

    feats = multimodal.image_features(df, "content", "id", dim=16).collect()
    f = {r["id"]: r["features"] for r in feats}
    fz = {r["id"]: r["featurizer"] for r in feats}
    assert len(f[0]) == 16 and f[2] is None and fz[2] is None
    # encoder is availability-selected; the featurizer column says which ran
    assert fz[0] in ("torch-resnet18", "pil-luma16", "sha256-stub")
    if fz[0] == "sha256-stub":
        assert all(0 <= v <= 1 for v in f[0])

    # explicit stub encoder is always available and says so
    stub = multimodal.image_features(df, "content", "id", dim=8, encoder="stub").collect()
    assert {r["featurizer"] for r in stub if r["featurizer"]} == {"sha256-stub"}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown encoder"):
        multimodal.image_features(df, "content", "id", encoder="nope").collect()

    frames = multimodal.sample_video_frames(df, "content", "id", every_n=1).collect()
    assert {r["id"] for r in frames} == {0, 1}
    # non-video bytes take the declared byte-slice fallback rung
    assert {r["method"] for r in frames} == {"byte-slice-fallback"}


def test_video_keyframe_extraction(spark):
    """Real ISO-BMFF keyframe extraction: sync-sample byte ranges from the
    stbl tables — bytes verified against the synthesized mdat payload."""
    mp4 = multimodal.synthesize_mp4(
        [10, 20, 30, 40, 50, 60, 70], sync_samples=[1, 4, 7], samples_per_chunk=3
    )
    df = spark.createDataFrame([(0, bytearray(mp4)), (1, None)], "id long, content binary")
    frames = multimodal.sample_video_frames(df, "content", "id", every_n=1).collect()
    by_idx = {r["frame_index"]: r for r in frames}
    # exactly the three sync samples, in track order, with exact bytes
    assert [by_idx[i]["sample_number"] for i in range(3)] == [1, 4, 7]
    assert bytes(by_idx[0]["frame"]) == bytes([1]) * 10
    assert bytes(by_idx[1]["frame"]) == bytes([4]) * 40
    assert bytes(by_idx[2]["frame"]) == bytes([7]) * 70
    assert {r["method"] for r in frames} == {"mp4-sync-sample"}
    # every_n strides over the sync-sample list
    strided = multimodal.sample_video_frames(df, "content", "id", every_n=2).collect()
    assert [r["sample_number"] for r in strided] == [1, 7]
    # no stss box => every sample is a keyframe (ISO 14496-12 §8.6.2)
    all_sync = multimodal.synthesize_mp4([8] * 5, sync_samples=None, samples_per_chunk=2)
    df2 = spark.createDataFrame([(0, bytearray(all_sync))], "id long, content binary")
    assert multimodal.sample_video_frames(df2, "content", "id", every_n=1).count() == 5
    # forced sync method on non-ISO bytes yields nothing (loud absence, not fake)
    df3 = spark.createDataFrame([(0, bytearray(b"x" * 4096))], "id long, content binary")
    assert multimodal.sample_video_frames(df3, "content", "id", method="sync").count() == 0
    with pytest.raises(ValueError, match="unknown method"):
        multimodal.sample_video_frames(df3, "content", "id", method="nope")


def test_video_sample_table_parser():
    """Table arithmetic against hand-computed layout: ragged last chunk,
    co64 absent, stss subset."""
    sizes = [5, 6, 7, 8]
    mp4 = multimodal.synthesize_mp4(sizes, sync_samples=[2], samples_per_chunk=3)
    table = multimodal.parse_video_sample_table(mp4)
    assert [s for s, *_ in table] == [1, 2, 3, 4]
    assert [sz for _, _, sz, _ in table] == sizes
    assert [sync for *_, sync in table] == [False, True, False, False]
    # offsets are contiguous within a chunk and restart at chunk 2
    assert table[1][1] == table[0][1] + 5 and table[2][1] == table[1][1] + 6
    for s, off, sz, _ in table:
        assert mp4[off : off + sz] == bytes([s]) * sz
    assert multimodal.parse_video_sample_table(None) is None
    assert multimodal.parse_video_sample_table(b"\x00\x00\x00\x08ftyp") is None


def test_top_distinctive_terms(spark):
    df = spark.createDataFrame(
        [
            (0, "apple apple apple shared shared"),
            (1, "banana banana shared shared"),
            (2, "cherry shared"),
        ],
        "doc_id long, text string",
    )
    out = text.top_distinctive_terms(df, "doc_id", "text", k=2, min_term_len=3)
    rows = {(r.id, r.rank): r for r in out.collect()}
    # doc-unique terms outrank the corpus-wide one
    assert rows[(0, 1)].term == "apple" and rows[(0, 1)].tf == 3 and rows[(0, 1)].df_count == 1
    assert rows[(1, 1)].term == "banana"
    assert rows[(2, 1)].term == "cherry"
    # 'shared' appears in all 3 docs -> low score, rank 2
    assert rows[(0, 2)].term == "shared" and rows[(0, 2)].df_count == 3
    # linear idf: score is tf/df exactly
    assert rows[(0, 1)].score == 3.0
    assert rows[(0, 2)].score == 2 / 3
    # log mode ranks the same here and uses ln(N/df)
    import math

    log_out = text.top_distinctive_terms(df, "doc_id", "text", k=1, min_term_len=3, idf="log")
    r = {r.id: r for r in log_out.collect()}
    assert r[0].term == "apple"
    assert abs(r[0].score - 3 * math.log(3 / 1)) < 1e-9


def test_group_centroids_and_l2_normalize(spark):
    import math

    rows = [
        (0, [3.0, 4.0]),    # norm 5 -> (0.6, 0.8)
        (0, [0.0, 1.0]),
        (1, [1.0, 0.0]),
        (1, None),          # excluded
        (1, [1.0, 0.0, 0.0]),  # wrong dim, excluded
        (2, [0.0, 0.0]),    # zero vector passes through unchanged
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<double>")
    out = {r.group: r for r in similarity.group_centroids(df, "label", "embedding", dim=2, normalize=True).collect()}
    assert out[0].n == 2 and out[1].n == 1 and out[2].n == 1
    assert abs(out[0].centroid[0] - 0.3) < 1e-12 and abs(out[0].centroid[1] - 0.9) < 1e-12
    assert out[1].centroid == [1.0, 0.0]
    assert out[2].centroid == [0.0, 0.0]
    # un-normalized mean
    raw = {r.group: r for r in similarity.group_centroids(df, "label", "embedding", dim=2).collect()}
    assert raw[0].centroid == [1.5, 2.5]
    # column helper agrees
    norm = df.where(F.col("label") == 0).select(similarity.l2_normalize(F.col("embedding")).alias("u")).collect()
    v = norm[0].u
    assert abs(math.hypot(*v) - 1.0) < 1e-12


def test_url_ops(spark):
    from dqx_spark.pipeline import web

    rows = [
        (0, "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&q=1"),
        (1, "http://sub.shop.example.co.uk/a/b/#frag"),
        (2, "not a url"),
        (3, "http://example.org:8080/x?ref=abc&keep=1"),
        (4, "http://user:pw@host.net/p"),
        (5, None),
        (6, "https://example.com"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {
        r.id: r
        for r in df.select(
            "id",
            web.url_host("url").alias("h"),
            web.registered_domain("url").alias("d"),
            web.url_normalize("url").alias("n"),
        ).collect()
    }
    assert out[0].h == "www.example.com" and out[0].d == "example.com"
    assert out[0].n == "https://example.com/Path/?q=1"  # www+port+utm stripped, path case kept
    assert out[1].h == "sub.shop.example.co.uk" and out[1].d == "co.uk"  # documented heuristic
    assert out[1].n == "http://sub.shop.example.co.uk/a/b"  # fragment + trailing / gone
    assert out[2].h == "" and out[2].d == "" and out[2].n == "not a url"
    assert out[3].n == "http://example.org:8080/x?keep=1"  # non-default port kept, ref dropped
    assert out[4].h == "host.net"  # userinfo stripped
    assert out[5].n == ""
    assert out[6].n == "https://example.com"


def test_url_normalize_param_edge_cases(spark):
    from dqx_spark.pipeline import web

    rows = [
        (0, "https://a.com/p?href=x&q=1"),            # href is NOT ref
        (1, "https://a.com/p?utm_a=1&utm_b=2&q=3"),   # consecutive tracked params
        (2, "https://a.com/p?ref=x"),                 # all params tracked
        (3, "https://a.com/p?q=1&ref=x"),             # tracked param last
        (4, "https://a.com/p?q=1&fbclid=z&r=2"),      # tracked param mid
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    out = {r.id: r.n for r in df.select("id", web.url_normalize("url").alias("n")).collect()}
    assert out[0] == "https://a.com/p?href=x&q=1"
    assert out[1] == "https://a.com/p?q=3"
    assert out[2] == "https://a.com/p"
    assert out[3] == "https://a.com/p?q=1"
    assert out[4] == "https://a.com/p?q=1&r=2"


def test_repair_mojibake_str():
    fix = text._repair_mojibake_str
    assert fix("Ã©tÃ© chaud") == "été chaud"
    assert fix("lâ€™hÃ´tel") == "l’hôtel"          # cp1252 leg (â€™ -> ’)
    assert fix("price â‚¬5") == "price €5"          # € through cp1252 0x80
    assert fix("café déjà ok") == "café déjà ok"     # clean text untouched
    assert fix("naÃ¯ve") == "naïve"
    assert fix("plain ascii") == "plain ascii"
    assert fix(None) is None
    # a legitimate 'Ã' that does not round-trip to fewer markers survives
    assert fix("Ã is a letter") == "Ã is a letter"


def test_normalize_text(spark):
    rows = [
        (0, "  hello\tworld  \n\n\n\n\nbye  "),
        (1, "zero​width­and\x07bell"),
        (2, "Ã©tÃ©   chaud"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = {r["id"]: r["n"] for r in df.select("id", text.normalize_text("t").alias("n")).collect()}
    assert out[0] == "hello world\n\nbye"
    assert out[1] == "zerowidth\xadandbell"  # zero-width + bell stripped; soft hyphen kept (not control)
    assert out[3] is None
    # python pass: mojibake + NFC in one UDF crossing
    out2 = {
        r["id"]: r["n"]
        for r in df.select(
            "id", text.normalize_text("t", repair_mojibake=True, nfc=True).alias("n")
        ).collect()
    }
    assert out2[2] == "été chaud"
    assert out2[3] is None


def test_redact_pii(spark):
    from dqx_spark.pipeline import text as T

    df = spark.createDataFrame(
        [
            (0, "mail me at bob@example.com or call 555-123-4567"),
            (1, "ssn 123-45-6789 card 4111 1111 1111 1111"),
            (2, "clean text"),
            (3, None),
        ],
        "id int, t string",
    )
    out = {r["id"]: r["red"] for r in df.select("id", T.redact_pii("t").alias("red")).collect()}
    assert "[EMAIL_ADDRESS]" in out[0] and "[PHONE_NUMBER]" in out[0]
    assert "bob@example.com" not in out[0]
    assert "[US_SSN]" in out[1] and "[CREDIT_CARD]" in out[1]
    assert "4111" not in out[1]
    assert out[2] == "clean text" and out[3] is None

    # entity subset + custom replacement
    only_ssn = {
        r["id"]: r["red"]
        for r in df.select(
            "id", T.redact_pii("t", entities=["US_SSN"], replacement="XXX").alias("red")
        ).collect()
    }
    assert only_ssn[1].startswith("ssn XXX card 4111")
    assert only_ssn[0] == "mail me at bob@example.com or call 555-123-4567"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported PII entities"):
        T.redact_pii("t", entities=["NOPE"])


class TestDedupParagraphs:
    @pytest.fixture(scope="class")
    def para_docs(self, spark):
        rows = [
            (1, "alpha beta\n\nshared paragraph here\n\nunique one"),
            (2, "shared paragraph here\n\nanother unique\n\nshared paragraph here"),
            (3, "totally distinct\n\n\n\nshared paragraph here"),
            (4, None),
            (5, "   \n\n  "),
            (6, "ok\n\nalpha beta"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_keep_first_corpus_occurrence(self, para_docs):
        out = {r.doc_id: r for r in dedup.dedup_paragraphs(para_docs, "doc_id", "text").collect()}
        # doc 1 owns the canonical copy of both duplicated paragraphs
        assert out[1].text_dedup == "alpha beta\n\nshared paragraph here\n\nunique one"
        assert out[1].removed_paragraph_count == 0
        # doc 2 loses both occurrences (cross-doc AND its own internal repeat)
        assert out[2].text_dedup == "another unique"
        assert out[2].removed_paragraph_count == 2
        assert out[3].text_dedup == "totally distinct"
        assert out[3].removed_paragraph_count == 1
        # null / whitespace-only docs come through empty, not crashed
        assert out[4].text_dedup == "" and out[4].removed_paragraph_count == 0
        assert out[5].text_dedup == "" and out[5].removed_paragraph_count == 0
        # doc 6 loses 'alpha beta' to doc 1
        assert out[6].text_dedup == "ok"
        # original columns preserved
        assert set(out[1].asDict()) == {"doc_id", "text", "text_dedup", "removed_paragraph_count"}

    def test_min_chars_exempts_short_paragraphs(self, para_docs):
        out = {
            r.doc_id: r
            for r in dedup.dedup_paragraphs(para_docs, "doc_id", "text", min_chars=15).collect()
        }
        # 'alpha beta' (10 chars) is exempt -> doc 6 keeps it; the 21-char
        # shared paragraph still dedups
        assert out[6].text_dedup == "ok\n\nalpha beta"
        assert out[6].removed_paragraph_count == 0
        assert out[2].text_dedup == "another unique"
        assert out[2].removed_paragraph_count == 2

    def test_md5_hash_mode_matches_xxhash_mode(self, para_docs):
        a = dedup.dedup_paragraphs(para_docs, "doc_id", "text").collect()
        b = dedup.dedup_paragraphs(para_docs, "doc_id", "text", hash_name="md5").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ngram_contamination_shuffle_path_matches_broadcast(spark):
    from dqx_spark.pipeline import mixing

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "z y x w v u t s r"), (3, "")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    kw = dict(n=8)
    bc = sorted(map(tuple, mixing.ngram_contamination(docs, ev, "doc_id", "text", **kw).collect()))
    sh = sorted(
        map(tuple, mixing.ngram_contamination(docs, ev, "doc_id", "text", broadcast=False, **kw).collect())
    )
    assert bc == sh
    # and the decontaminate wrapper forwards the flag
    kept = mixing.decontaminate(docs, ev, "doc_id", "text", threshold=0.1, n=8, broadcast=False)
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {2, 3}


def test_minhash_lsh_pair_recall_vs_exact_jaccard(spark):
    """Certify banded MinHash-LSH the way the ANN indexes are certified:
    pair recall against the EXACT n-gram Jaccard pairs on the driver
    documents table, with a floor.  With 64 hashes / 16 bands the collision
    probability at j=0.5 is 1-(1-0.5^4)^16 ≈ 0.65 and rises steeply above
    the threshold, so high-similarity pairs (j >= 0.7, collision ≥ 0.98)
    must essentially all be recovered."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", k=5, threshold=0.7)
    truth = {(r.id_a, r.id_b) for r in exact.select("id_a", "id_b").collect()}
    assert truth, "fixture must contain high-similarity pairs"
    got = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", num_hashes=64, bands=16, shingle_k=5, threshold=0.5
        )
        .select("id_a", "id_b")
        .collect()
    }
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"MinHash-LSH pair recall {recall} over {len(truth)} true pairs"


class TestCrossCorpusDecontamination:
    @pytest.fixture(scope="class")
    def corpora(self, spark):
        eval_rows = [
            (100, "the capital of france is paris and the capital of spain is madrid ok"),
            (101, "water boils at one hundred degrees celsius at standard sea level pressure"),
        ]
        train_rows = [
            # near-copy of eval 100 (one word changed)
            (1, "the capital of france is paris and the capital of spain is madrid yes"),
            # verbatim copy of eval 101
            (2, "water boils at one hundred degrees celsius at standard sea level pressure"),
            # clean documents
            (3, "spark dataframes shuffle partitions broadcast joins and adaptive execution"),
            (4, "completely unrelated text about gardening tomatoes in the summer heat"),
            # internal train near-dups of each other but NOT of eval: must survive
            (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
            (6, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
        ]
        return (
            spark.createDataFrame(train_rows, "doc_id long, text string"),
            spark.createDataFrame(eval_rows, "doc_id long, text string"),
        )

    def test_cross_pairs_only_across_corpora(self, corpora):
        train, ev = corpora
        pairs = dedup.cross_corpus_lsh_pairs(
            train, ev, "doc_id", "text", shingle_k=3, threshold=0.5, verify_exact=True
        ).collect()
        got = {(r.id_a, r.id_b) for r in pairs}
        assert (1, 100) in got and (2, 101) in got
        # within-train near-dup pair (5,6) must NOT appear
        assert all(b >= 100 for _, b in got)
        assert all(a < 100 for a, _ in got)
        exact = {(r.id_a, r.id_b): r.jaccard for r in pairs}
        assert exact[(2, 101)] == 1.0

    def test_fuzzy_decontaminate_drops_near_copies_only(self, corpora):
        train, ev = corpora
        kept = dedup.fuzzy_decontaminate(
            train, ev, "doc_id", "text", threshold=0.5, shingle_k=3, verify_exact=True
        )
        assert {r.doc_id for r in kept.select("doc_id").collect()} == {3, 4, 5, 6}

    def test_broadcast_and_shuffle_paths_agree(self, corpora):
        train, ev = corpora
        kw = dict(shingle_k=3, threshold=0.5, verify_exact=True)
        a = sorted(map(tuple, dedup.cross_corpus_lsh_pairs(train, ev, "doc_id", "text", **kw).collect()))
        b = sorted(
            map(
                tuple,
                dedup.cross_corpus_lsh_pairs(train, ev, "doc_id", "text", broadcast=False, **kw).collect(),
            )
        )
        assert a == b


def test_key_skew_diagnostics(spark):
    from dqx_spark.pipeline import diagnostics

    rows = [("hot", i) for i in range(80)] + [("warm", i) for i in range(16)] + [
        (f"k{i}", i) for i in range(4)
    ] + [(None, 99)]
    df = spark.createDataFrame(rows, "k string, v int")
    top = diagnostics.key_frequencies(df, ["k"], top_k=3).collect()
    assert [r.k for r in top] == ["hot", "warm", None] or [r.k for r in top][:2] == ["hot", "warm"]
    assert top[0].key_count == 80 and abs(top[0].key_fraction - 80 / 101) < 1e-9

    s = diagnostics.key_skew_stats(df, ["k"]).collect()[0]
    assert s.n_rows == 101 and s.n_keys == 7 and s.max_key_count == 80
    # skew = 80 / (101/7) ≈ 5.54 -> salt = 2^ceil(log2(5.54/4)) = 2
    assert abs(s.skew_factor - 80 / (101 / 7)) < 1e-2
    assert s.suggested_salt == 2

    # uniform key: no salting suggested
    u = spark.createDataFrame([(i % 4, i) for i in range(40)], "k int, v int")
    su = diagnostics.key_skew_stats(u, ["k"]).collect()[0]
    assert su.skew_factor == 1.0 and su.suggested_salt == 1


class TestAudioDecoding:
    def test_wav_and_flac_header_parsing(self, spark):
        import io
        import wave

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(2)
            w.setframerate(44100)
            w.writeframes(b"\x00\x00" * 2 * 44100)  # 1.0 s stereo 16-bit
        wav = buf.getvalue()
        assert multimodal.parse_audio_header(wav) == (44100, 2, 16, 1.0, "wav-fmt")

        packed = (48000 << 44) | ((1 - 1) << 41) | ((24 - 1) << 36) | 96000
        flac = b"fLaC" + bytes([0x80, 0, 0, 34]) + b"\x00" * 10 + packed.to_bytes(8, "big") + b"\x00" * 16
        assert multimodal.parse_audio_header(flac) == (48000, 1, 24, 2.0, "flac-streaminfo")
        assert multimodal.parse_audio_header(b"garbage") is None
        assert multimodal.parse_audio_header(None) is None

        rows = [(1, bytearray(wav)), (2, bytearray(flac)), (3, bytearray(b"nope")), (4, None)]
        df = spark.createDataFrame(rows, "id long, data binary")
        got = {r.id: r for r in multimodal.decode_audio(df, "data", "id").collect()}
        assert (got[1].sample_rate, got[1].channels, got[1].duration_s) == (44100, 2, 1.0)
        assert got[2].decoder == "flac-streaminfo" and got[2].bits_per_sample == 24
        assert not got[3].decode_ok and got[3].decoder == "header"
        assert not got[4].decode_ok and got[4].decoder is None

    def test_riff_mime_refinement(self, spark):
        webp = b"RIFF" + (100).to_bytes(4, "little") + b"WEBPVP8 " + b"\x00" * 40
        avi = b"RIFF" + (100).to_bytes(4, "little") + b"AVI LIST" + b"\x00" * 40
        wav = b"RIFF" + (36).to_bytes(4, "little") + b"WAVEfmt " + b"\x00" * 40
        df = spark.createDataFrame(
            [(1, bytearray(webp)), (2, bytearray(avi)), (3, bytearray(wav))], "id long, data binary"
        )
        got = {r.id: r.m for r in df.select("id", multimodal.sniff_mime("data").alias("m")).collect()}
        assert got == {1: "image/webp", 2: "video/x-msvideo", 3: "audio/wav"}


def test_embedding_quantization_round_trip_and_recall(spark):
    """int8 quantization: exact round trips for representable values, zero
    vectors stay zero, and quantized cosine top-10 recall >= 0.9 against
    exact on the driver embeddings."""
    import os

    from dqx_spark.pipeline.similarity import (
        cosine_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [127.0, -127.0, 0.0, 63.5]), (2, [0.0, 0.0, 0.0, 0.0])], "id long, v array<double>"
    )
    q = quantize_embeddings(df, "v")
    got = {r.id: (list(r.v_q8), r.v_scale) for r in q.collect()}
    assert got[1] == ([127, -127, 0, 64], 1.0)   # 63.5/1.0 rounds half-up to 64
    assert got[2] == ([0, 0, 0, 0], 0.0)
    back = {r.id: list(r.d) for r in q.select("id", dequantize_embeddings("v_q8", "v_scale").alias("d")).collect()}
    assert back[1] == [127.0, -127.0, 0.0, 64.0] and back[2] == [0.0, 0.0, 0.0, 0.0]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qemb = quantize_embeddings(emb, "embedding").select(
        "vec_id", dequantize_embeddings("embedding_q8", "embedding_scale").alias("embedding")
    )
    qv = [float(x) for x in emb.where("vec_id = 3").collect()[0]["embedding"]]
    exact = {r.id for r in cosine_topk(emb, qv, "embedding", "vec_id", 10).collect()}
    approx = {r.id for r in cosine_topk(qemb, qv, "embedding", "vec_id", 10).collect()}
    assert len(exact & approx) / 10 >= 0.9


def test_mp4_video_metadata_decoding(spark):
    import struct

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    mvhd = box(b"mvhd", bytes([0, 0, 0, 0]) + b"\x00" * 8 + struct.pack(">II", 1000, 5500) + b"\x00" * 80)
    tkhd = box(b"tkhd", bytes([0, 0, 0, 0]) + b"\x00" * 72 + struct.pack(">II", 1920 << 16, 1080 << 16))
    mp4 = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + box(b"moov", mvhd + box(b"trak", tkhd))
    assert multimodal.parse_video_header(mp4) == (5.5, 1920, 1080, "mp4-moov")
    assert multimodal.parse_video_header(b"nope") is None

    df = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(b"junk")), (3, None)], "id long, data binary"
    )
    got = {r.id: r for r in multimodal.decode_video_metadata(df, "data", "id").collect()}
    assert (got[1].duration_s, got[1].width, got[1].height, got[1].decoder) == (5.5, 1920, 1080, "mp4-moov")
    assert not got[2].decode_ok and not got[3].decode_ok


def test_keep_best_per_group_and_remove_near_duplicates(spark, docs):
    """Keeper selection: default keeper is the group representative (min
    id); with a quality column the highest-quality member wins and ties
    break to the smallest id; remove_near_duplicates returns the pruned
    corpus."""
    # default policy: keeper == group_id
    groups = dedup.near_duplicate_groups(docs, "id", "text", method="ngram", threshold=0.5, k=3)
    flagged = dedup.keep_best_per_group(docs, "id", groups)
    rows = {r["id"]: r for r in flagged.collect()}
    assert rows[0]["kept"] and rows[0]["keeper_id"] == 0
    assert not rows[1]["kept"] and rows[1]["keeper_id"] == 0
    assert not rows[4]["kept"]
    assert rows[3]["kept"] and rows[3]["keeper_id"] == 3  # singleton keeps itself

    # quality policy: highest quality wins, null quality loses, ties -> min id
    quality = docs.withColumn(
        "q",
        F.when(F.col("id") == 4, F.lit(9.0))
        .when(F.col("id") == 1, F.lit(None).cast("double"))
        .otherwise(F.lit(5.0)),
    )
    flagged_q = dedup.keep_best_per_group(quality, "id", groups, keep_col="q")
    rows_q = {r["id"]: r for r in flagged_q.collect()}
    assert rows_q[4]["kept"] and rows_q[0]["keeper_id"] == 4  # 9.0 beats 5.0
    assert not rows_q[0]["kept"] and not rows_q[1]["kept"]

    pruned = dedup.remove_near_duplicates(quality, "id", "text", method="ngram", threshold=0.5, k=3, keep_col="q")
    kept_ids = {r["id"] for r in pruned.select("id").collect()}
    assert kept_ids == {2, 3, 4, 5}
    assert "group_id" in pruned.columns and "kept" not in pruned.columns


def test_remove_duplicate_spans(spark):
    """ExactSubstr-style token-span dedup: a shared 8-token run survives
    only at its smallest (id, position); within-doc repeats are cut; short
    docs and NULL-id rows pass through; md5 and xxhash64 modes agree."""
    rows = [
        (0, "a b c d e f g h x y"),
        (1, "p q a b c d e f g h r"),     # shares span [a..h] with doc 0
        (2, "m n o p q r s t u m n o p q r s t u"),  # self-repeat
        (3, "short doc"),
        (None, "a b c d e f g h x y"),    # null id: sits out
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    for mode in ("md5", "xxhash64"):
        out = {r["id"]: r for r in dedup.remove_duplicate_spans(docs, "id", "text", k=8, hash_name=mode).collect()}
        assert out[0]["text_dedup"] == "a b c d e f g h x y" and out[0]["removed_token_count"] == 0
        assert out[1]["text_dedup"] == "p q r" and out[1]["removed_token_count"] == 8
        assert out[2]["text_dedup"] == "m n o p q r s t u" and out[2]["removed_token_count"] == 9
        assert out[3]["text_dedup"] == "short doc" and out[3]["removed_token_count"] == 0
        nulls = [r for r in dedup.remove_duplicate_spans(docs, "id", "text", k=8, hash_name=mode).collect() if r["id"] is None]
        assert nulls[0]["text_dedup"] == "a b c d e f g h x y" and nulls[0]["removed_token_count"] == 0
    with pytest.raises(ValueError):
        dedup.remove_duplicate_spans(docs, "id", "text", k=1)
    with pytest.raises(ValueError):
        dedup.remove_duplicate_spans(docs, "id", "text", hash_name="sha1")


def test_remove_duplicate_spans_idempotent(spark):
    """Running span dedup on its own output removes nothing more (the
    surviving canonical occurrences are each unique corpus-wide)."""
    rows = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod " + f"tail{i}") for i in range(6)]
    docs = spark.createDataFrame(rows, "id long, text string")
    once = dedup.remove_duplicate_spans(docs, "id", "text", k=8).select("id", F.col("text_dedup").alias("text"))
    twice = dedup.remove_duplicate_spans(once, "id", "text", k=8)
    assert twice.where(F.col("removed_token_count") > 0).count() == 0
    a = {r["id"]: r["text"] for r in once.collect()}
    b = {r["id"]: r["text_dedup"] for r in twice.collect()}
    assert a == b


def test_remove_duplicate_spans_protects_canonical_overlap(spark):
    """A span's canonical occurrence survives even when it overlaps a
    DIFFERENT span's losing occurrence in the same document (r6 review
    fix: without protection the duplicated content could be destroyed
    corpus-wide)."""
    rows = [
        (0, "a b c d e f g h q r"),
        (1, "a b c d e f g h i j k l m"),  # loses [a..h] to doc 0; wins [f..m]
        (2, "z f g h i j k l m"),          # loses [f..m] to doc 1
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r for r in dedup.remove_duplicate_spans(docs, "id", "text", k=8).collect()}
    assert out[0]["text_dedup"] == "a b c d e f g h q r"
    # doc 1: positions 0-4 cut (a..e), 5-12 protected as the [f..m] winner
    assert out[1]["text_dedup"] == "f g h i j k l m"
    assert out[1]["removed_token_count"] == 5
    # doc 2's copy of [f..m] is the loser and is fully removed
    assert out[2]["text_dedup"] == "z"
    # the duplicated span [f g h i j k l m] survives intact exactly once
    survivors = sum("f g h i j k l m" in out[i]["text_dedup"] for i in range(3))
    assert survivors == 1


def test_dedup_by_url(spark):
    """URL-level dedup: one keeper per normalized key (tracking params /
    www / fragments collapse), non-URLs always kept, quality keeper
    policy matches keep_best_per_group semantics."""
    from dqx_spark.pipeline import web

    rows = [
        (0, "https://www.example.com/a?utm_source=x", 5.0),
        (1, "https://example.com/a", 9.0),       # same key as 0
        (2, "http://example.com/a", 1.0),        # different scheme: distinct key
        (3, "not a url", 1.0),
        (4, "not a url", 2.0),                   # non-URLs never merge
        (5, "https://other.org/b#frag", None),
    ]
    df = spark.createDataFrame(rows, "id long, url string, q double")
    out = {r["id"]: r["kept"] for r in web.dedup_by_url(df, "id", "url").collect()}
    assert out == {0: True, 1: False, 2: True, 3: True, 4: True, 5: True}
    byq = {r["id"]: r["kept"] for r in web.dedup_by_url(df, "id", "url", keep_col="q").collect()}
    assert byq[1] and not byq[0]  # higher quality wins within the key
    assert byq[2] and byq[3] and byq[4] and byq[5]


def test_winnowing_fingerprints_and_pairs(spark, docs):
    """Winnowing (MOSS): fingerprint sets shrink vs full shingling but the
    detection guarantee holds — near-dup docs sharing a long run produce
    a common fingerprint; unrelated docs do not pair; md5 and xxhash64
    modes agree on the pair set."""
    from dqx_spark.pipeline.text import winnowing_fingerprints

    k, w = 3, 3
    fp = winnowing_fingerprints(docs, "id", "text", k=k, w=w)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["id"], set()).add(r["h"])
    full = {}
    for r in text.exploded_shingle_hashes(docs, "id", "text", k=k).collect():
        full.setdefault(r["id"], set()).add(r["h"])
    for i, sel in by_doc.items():
        assert sel <= full[i]            # selection, not invention
        assert len(sel) <= len(full[i])
    # exact dup docs 0/4 select identical sets
    assert by_doc[0] == by_doc[4]
    # empty doc has no fingerprints
    assert 5 not in by_doc

    for mode in ("xxhash64", "md5"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in dedup.winnowing_pairs(docs, "id", "text", k=k, w=w, hash_name=mode).collect()
        }
        assert (0, 4) in pairs and (0, 1) in pairs  # guarantee: long shared runs detected
        assert all(3 not in p and 2 not in p for p in pairs)  # unrelated docs never pair


def test_winnowing_guarantee_property(spark):
    """Any shared run of >= w + k - 1 tokens is detected (the paper's
    floor), even when the run sits at different offsets in each doc."""
    k, w = 4, 5
    run = "q w e r t y u i o p a s d f"  # 14 tokens >= w + k - 1 = 8
    rows = [
        (0, run + " unique tail zero one two"),
        (1, "different lead in words " + run),
        (2, "totally unrelated content about something else entirely here now"),
    ]
    docs = spark.createDataFrame(rows, "id long, text string")
    pairs = {(r["id_a"], r["id_b"]): r["common"] for r in
             dedup.winnowing_pairs(docs, "id", "text", k=k, w=w).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_resize_images_plumbing(spark):
    """Resize plumbing: schema, null handling, and the availability ladder
    — PIL path produces real width x height re-encoded bytes; without PIL
    the original bytes pass through honestly flagged resize_ok=false."""
    png = bytes.fromhex("89504E470D0A1A0A0000000D49484452") + (320).to_bytes(4, "big") + (
        200
    ).to_bytes(4, "big") + bytes.fromhex("0806000000")
    df = spark.createDataFrame([(1, png), (2, None)], "id long, img binary")
    out = {r["id"]: r for r in multimodal.resize_images(df, "img", "id", width=32, height=32).collect()}
    assert set(out[1].asDict()) == {"id", "image_resized", "width", "height", "resize_ok", "method"}
    assert out[2]["image_resized"] is None and not out[2]["resize_ok"] and out[2]["method"] == "null"
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        # header-only PNG isn't a full decodable image: PIL fails -> ok=false
        assert out[1]["method"] == "pil"
        from PIL import Image
        import io as _io

        buf = _io.BytesIO()
        Image.new("RGB", (320, 200), (10, 20, 30)).save(buf, format="PNG")
        real = spark.createDataFrame([(3, buf.getvalue())], "id long, img binary")
        r = multimodal.resize_images(real, "img", "id", width=32, height=32).collect()[0]
        assert r["resize_ok"] and (r["width"], r["height"]) == (32, 32)
        assert Image.open(_io.BytesIO(r["image_resized"])).size == (32, 32)
    else:
        assert out[1]["method"] == "passthrough"
        assert bytes(out[1]["image_resized"]) == png and not out[1]["resize_ok"]


def test_resize_images_validates_format_eagerly(spark):
    from dqx_spark.pipeline import multimodal as M

    df = spark.createDataFrame([(1, b"x")], "id long, img binary")
    with pytest.raises(ValueError):
        M.resize_images(df, "img", "id", fmt="XCF")
    # common aliases normalize instead of failing
    M.resize_images(df, "img", "id", fmt="jpg")


def test_near_duplicate_groups_winnow_method(spark, docs):
    groups = dedup.near_duplicate_groups(docs, "id", "text", method="winnow", k=3, w=3, min_common=2)
    label = {r["id"]: r["group_id"] for r in groups.collect()}
    assert label[0] == label[1] == label[4] == 0  # long shared runs group
    assert label[2] == 2 and label[3] == 3        # unrelated stay singletons


def test_ann_local_twin_matches_spark(spark):
    """r7: the driver-local pure-Python ANN twin (ann_local) must replay the
    distributed Column expressions bit-exactly — this test pins the parity
    the ann_topk gate oracle relies on (Spark-compatible xxhash64 planes,
    left-fold cosine, centroid assignment)."""
    import os

    from dqx_spark.pipeline import ann_local
    from dqx_spark.pipeline.similarity import _lloyd_centroids

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in df.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .orderBy("vec_id")
        .collect()
    ]
    query = next(v for i, v in rows if i == 0)

    spark_lsh = [
        (r["id"], r["rank"])
        for r in similarity.ann_lsh_topk(df, query, "embedding", "vec_id", k=10).orderBy("rank").collect()
    ]
    assert ann_local.lsh_topk_local(rows, query, k=10) == spark_lsh

    centroids = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    assert centroids == _lloyd_centroids([v for _, v in rows], 8, seed=42, max_iter=50, n_init=20)
    indexed = similarity.ivf_assign_buckets(df, centroids, "embedding", "vec_id")
    spark_assign = {r["id"]: r["ivf_bucket"] for r in indexed.collect()}
    for rid, vec in rows:
        assert ann_local.assign_bucket_local(vec, centroids) == spark_assign[rid]
    spark_ivf = [
        (r["id"], r["rank"])
        for r in similarity.ivf_topk(indexed, centroids, query, k=10).orderBy("rank").collect()
    ]
    assert ann_local.ivf_topk_local(rows, centroids, query, k=10) == spark_ivf


def test_ivf_centroid_path_recall(spark):
    """The FAISS-style sample-trained centroid path (ivf_train_centroids +
    ivf_assign_buckets) must hold the same recall floor as the pyspark.ml
    KMeans path the gate row previously used."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    centroids = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    indexed = similarity.ivf_assign_buckets(df, centroids, "embedding", "vec_id").cache()
    qids = [0, 7, 13, 21, 33]
    qvecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in df.where(F.col("vec_id").isin(qids)).collect()}
    recalls = []
    for qid, qv in qvecs.items():
        exact = {r["id"] for r in similarity.cosine_topk(df, qv, "embedding", "vec_id", 10).collect()}
        got = {r["id"] for r in similarity.ivf_topk(indexed, centroids, qv, k=10, n_probe=6).collect()}
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.9, f"IVF(sample-centroid) recall@10 {recalls}"
    df.unpersist()
    indexed.unpersist()


def test_redact_pii(spark):
    """r7: transform-side PII scrubbing (pipeline.pii.redact_pii) — typed
    placeholders, per-entity counts on the original text, deterministic
    sorted application order, null passthrough, entity validation."""
    from dqx_spark.pipeline import pii

    df = spark.createDataFrame(
        [
            (1, "mail bob@example.com or call 555-123-4567"),
            (2, "ssn 123-45-6789 card 4111 1111 1111 1111 ip 10.0.0.1"),
            (3, "no pii here"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r["id"]: r for r in pii.redact_pii(df, "doc_id", "text").collect()}
    assert out[1]["text_redacted"] == "mail [EMAIL_ADDRESS] or call [PHONE_NUMBER]"
    assert out[1]["pii_redaction_count"] == 2 and out[1]["n_email_address"] == 1
    assert out[2]["text_redacted"] == "ssn [US_SSN] card [CREDIT_CARD] ip [IP_ADDRESS]"
    assert out[2]["n_us_ssn"] == 1 and out[2]["n_credit_card"] == 1 and out[2]["n_ip_address"] == 1
    assert out[3]["text_redacted"] == "no pii here" and out[3]["pii_redaction_count"] == 0
    assert out[4]["text_redacted"] is None

    # uniform replacement + entity subset + no counts
    flat = pii.redact_pii(
        df, "doc_id", "text", entities=["EMAIL_ADDRESS"], replacement="<PII>", count_matches=False
    )
    assert flat.columns == ["id", "text_redacted"]
    got = {r["id"]: r["text_redacted"] for r in flat.collect()}
    assert got[1] == "mail <PII> or call 555-123-4567"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported PII entities"):
        pii.redact_pii(df, "doc_id", "text", entities=["NOPE"])


def test_redact_pii_plan_is_single_projection(spark):
    """Redaction must stay one projected scan — no shuffle, no Python."""
    from dqx_spark.pipeline import pii

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    out = pii.redact_pii(df, "doc_id", "text")
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in p


class TestBloomDecontamination:
    """r7: Bloom-filter decontamination — the broadcast-bitmap scale path
    next to the exact membership join."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [(i, " ".join(f"w{(i * 17 + j) % 40}" for j in range(12))) for i in range(60)]
        rows += [(100, "a b c d e f g h i j k l"), (101, "a b c d e f g h zz yy xx"), (102, "")]
        return spark.createDataFrame(rows, "doc_id long, text string")

    @pytest.fixture(scope="class")
    def eval_set(self, corpus):
        return corpus.where((F.col("doc_id") % 7 == 0) | (F.col("doc_id") == 100))

    @pytest.mark.parametrize("hash_name", ["xxhash64", "md5"])
    def test_bloom_hits_superset_of_exact(self, corpus, eval_set, hash_name):
        from dqx_spark.pipeline import mixing

        exact = {
            r["id"]: (r["total_ngrams"], r["hit_ngrams"])
            for r in mixing.ngram_contamination(corpus, eval_set, "doc_id", "text", n=5).collect()
        }
        bloom = mixing.build_ngram_bloom(
            eval_set, "text", n=5, num_bits=1 << 12, num_hashes=3, hash_name=hash_name
        )
        bl = {
            r["id"]: (r["total_ngrams"], r["hit_ngrams"])
            for r in mixing.bloom_contamination(corpus, bloom, "doc_id", "text").collect()
        }
        assert set(bl) == set(exact)
        for i in exact:
            assert bl[i][0] == exact[i][0], "total n-grams must agree"
            assert bl[i][1] >= exact[i][1], "bloom membership is a superset"
        # every true eval member hits: docs fully inside the eval set score 1.0
        assert bl[100][1] == bl[100][0] > 0
        # empty doc: zero n-grams, contamination 0
        assert bl[102] == (0, 0)

    def test_bloom_decontaminate_never_keeps_what_exact_drops(self, corpus, eval_set):
        from dqx_spark.pipeline import mixing

        bloom = mixing.build_ngram_bloom(eval_set, "text", n=5, num_bits=1 << 12, num_hashes=3)
        kept_exact = {
            r["doc_id"]
            for r in mixing.decontaminate(corpus, eval_set, "doc_id", "text", threshold=0.3, n=5).collect()
        }
        kept_bloom = {
            r["doc_id"]
            for r in mixing.bloom_decontaminate(corpus, bloom, "doc_id", "text", threshold=0.3).collect()
        }
        assert kept_bloom <= kept_exact

    def test_bloom_parameter_validation(self, corpus):
        from dqx_spark.pipeline import mixing

        with pytest.raises(ValueError, match="power of two"):
            mixing.build_ngram_bloom(corpus, "text", num_bits=1000)
        with pytest.raises(ValueError, match="64"):
            mixing.build_ngram_bloom(corpus, "text", num_bits=32)  # < one bitmap word
        with pytest.raises(ValueError, match="num_hashes"):
            mixing.build_ngram_bloom(corpus, "text", num_bits=64, num_hashes=0)

    def test_bloom_positions_distinct_and_bounded(self, spark):
        """The odd-stride double hash must give num_hashes DISTINCT in-range
        positions (the FP analysis assumes k distinct probes)."""
        from dqx_spark.pipeline.mixing import _bloom_positions

        m, k = 1 << 10, 5
        df = spark.range(2000).select(F.xxhash64("id").alias("h"))
        out = df.select(
            F.size(F.array_distinct(_bloom_positions(F.col("h"), m, k))).alias("nd"),
            F.array_max(_bloom_positions(F.col("h"), m, k)).alias("mx"),
            F.array_min(_bloom_positions(F.col("h"), m, k)).alias("mn"),
        ).agg(F.min("nd"), F.max("mx"), F.min("mn")).collect()[0]
        assert out[0] == k and out[1] < m and out[2] >= 0


def test_pq_local_twin_matches_spark_and_recall(spark):
    """r7: product quantization — (a) the pure-Python twin replays the
    distributed encode argmin and ADC ranking bit-exactly (the parity the
    ann_topk gate oracle's pq rows rely on); (b) ADC recall@10 vs the exact
    EUCLIDEAN top-k clears a floor (PQ approximates L2, so L2 is the fair
    exact baseline — for cosine parity l2_normalize first)."""
    import os

    from dqx_spark.pipeline import ann_local

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in df.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .orderBy("vec_id")
        .collect()
    ]
    query = next(v for i, v in rows if i == 0)

    books = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=16, num_centroids=16,
        seed=42, max_iter=25, n_init=4, sample_order_by="vec_id",
    )
    encoded = similarity.pq_encode(df, books, "embedding", "vec_id")
    spark_codes = {r["id"]: list(r["pq_code"]) for r in encoded.collect()}
    for rid, vec in rows:
        assert ann_local.pq_encode_local(vec, books) == spark_codes[rid]
    spark_pq = [
        (r["id"], r["rank"])
        for r in similarity.pq_topk(encoded, books, query, k=10).orderBy("rank").collect()
    ]
    assert ann_local.pq_topk_local(rows, books, query, k=10) == spark_pq
    spark_pq_rr = [
        (r["id"], r["rank"])
        for r in similarity.pq_topk(encoded, books, query, k=10, rerank_r=50).orderBy("rank").collect()
    ]
    assert ann_local.pq_topk_local(rows, books, query, k=10, rerank_r=50) == spark_pq_rr
    # composed IVFPQ (r8: canonical IVFADC — residual-trained codebooks,
    # residual codes, per-cell query-residual LUTs), twin replayed
    # end-to-end; the legacy raw-code composition stays reachable via
    # residual=False and keeps its own (weaker) parity assertion
    centroids = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    indexed = similarity.ivf_assign_buckets(df, centroids, "embedding", "vec_id")
    books_res = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=16, num_centroids=16,
        seed=42, max_iter=25, n_init=4, sample_order_by="vec_id",
        residual_centroids=centroids,
    )
    encoded_res = similarity.pq_encode(
        indexed, books_res, "vec", "id", residual_centroids=centroids
    )
    # residual codes themselves replay bit-exactly
    res_codes = {r["id"]: list(r["pq_code"]) for r in encoded_res.collect()}
    for rid, vec in rows:
        resid = similarity.residual_local(vec, centroids)
        assert ann_local.pq_encode_local(resid, books_res) == res_codes[rid]
    spark_ivfpq = [
        (r["id"], r["rank"])
        for r in similarity.ivfpq_topk(
            encoded_res, centroids, books_res, query, k=10, n_probe=6, rerank_r=50
        ).orderBy("rank").collect()
    ]
    assert ann_local.ivfpq_topk_local(
        rows, centroids, books_res, query, k=10, n_probe=6, rerank_r=50
    ) == spark_ivfpq
    both_raw = indexed.join(encoded.select("id", "pq_code"), "id")
    spark_ivfpq_raw = [
        (r["id"], r["rank"])
        for r in similarity.ivfpq_topk(
            both_raw, centroids, books, query, k=10, n_probe=6, rerank_r=50, residual=False
        ).orderBy("rank").collect()
    ]
    assert ann_local.ivfpq_topk_local(
        rows, centroids, books, query, k=10, n_probe=6, rerank_r=50, residual=False
    ) == spark_ivfpq_raw

    # recall vs exact L2 (driver-side ground truth over the 500 rows)
    def l2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    exact = {i for i, _ in sorted(rows, key=lambda t: (l2(t[1], query), t[0]))[:10]}
    recall_adc = len(exact & {i for i, _ in spark_pq}) / 10
    recall_rr = len(exact & {i for i, _ in spark_pq_rr}) / 10
    recall_ivfpq = len(exact & {i for i, _ in spark_ivfpq}) / 10
    assert recall_adc >= 0.4, f"PQ ADC recall@10 {recall_adc} below floor"
    assert recall_rr >= 0.8, f"PQ ADC+rerank recall@10 {recall_rr} below floor"
    # the composed index loses at most the IVF pruning's recall on top of
    # PQ+rerank — floor it too so a both-sides-consistent quality
    # regression (which parity cannot catch) still fails a test.
    # r8: residual encoding (IVFADC) raised the floor 0.7 -> 0.85 — the
    # codewords now model the within-cell distribution (VERDICT r7 item 3)
    assert recall_ivfpq >= 0.85, f"IVFADC recall@10 {recall_ivfpq} below floor"

    with pytest.raises(ValueError, match="divisible"):
        similarity.pq_train_codebooks(df, "embedding", dim=64, num_subvectors=7)


def test_readability_scores(spark):
    """r7: sentence/syllable heuristics and the Flesch formula, checked
    against hand counts."""
    df = spark.createDataFrame(
        [
            (0, "The cat sat. The dog ran! Did it?"),   # 3 sentences, 8 words
            (1, "no terminator here"),                   # words, no [.!?] -> 1 sentence
            (2, ""),                                     # wordless -> flesch NULL
            (3, "Wait... what?!"),                       # runs collapse: 2 sentences
        ],
        "id long, text string",
    )
    out = {
        r["id"]: r
        for r in df.select(
            "id",
            text.sentence_count("text").alias("s"),
            text.syllable_count("text").alias("y"),
            text.flesch_reading_ease("text").alias("f"),
        ).collect()
    }
    assert out[0]["s"] == 3 and out[1]["s"] == 1 and out[2]["s"] == 0 and out[3]["s"] == 2
    # "The cat sat." -> 1 syllable each; every word in doc 0 is monosyllabic
    assert out[0]["y"] == 8
    w, s, y = 8.0, 3.0, 8.0
    assert abs(out[0]["f"] - (206.835 - 1.015 * (w / s) - 84.6 * (y / w))) < 1e-9
    assert out[2]["f"] is None


def test_embedding_cross_pairs_and_decontaminate(spark):
    """r8: embedding cross-corpus decontamination — exact path equals a
    brute-force cosine check, the sign-LSH path holds a recall floor on
    high-similarity pairs, and decontaminate drops exactly the flagged
    rows."""
    import math
    import random

    from dqx_spark.pipeline import dedup

    random.seed(7)
    dim = 16

    def rnd():
        return [random.uniform(-1, 1) for _ in range(dim)]

    ev_rows = [(100 + i, rnd()) for i in range(8)]
    # corpus: 20 random rows + 8 near-copies of eval vectors (tiny jitter)
    corpus_rows = [(i, rnd()) for i in range(20)]
    for j, (evid, v) in enumerate(ev_rows):
        corpus_rows.append((50 + j, [x + random.uniform(-0.01, 0.01) for x in v]))
    corpus = spark.createDataFrame(corpus_rows, "id long, emb array<double>")
    ev = spark.createDataFrame(ev_rows, "id long, emb array<double>")

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na, nb = math.sqrt(sum(x * x for x in a)), math.sqrt(sum(x * x for x in b))
        return dot / (na * nb) if na and nb else 0.0

    truth = {
        (cid, evid)
        for cid, cv in corpus_rows
        for evid, evv in ev_rows
        if cos(cv, evv) >= 0.9
    }
    assert len(truth) >= 8  # the planted near-copies
    exact = {
        (r["corpus_id"], r["eval_id"])
        for r in dedup.embedding_cross_pairs(corpus, ev, "id", "emb", threshold=0.9, num_planes=None).collect()
    }
    assert exact == truth
    lsh = {
        (r["corpus_id"], r["eval_id"])
        for r in dedup.embedding_cross_pairs(corpus, ev, "id", "emb", threshold=0.9, num_planes=6).collect()
    }
    assert lsh <= exact  # LSH only prunes candidates, never invents pairs
    assert len(lsh & truth) / len(truth) >= 0.75, f"LSH recall {len(lsh & truth)}/{len(truth)}"

    surv = dedup.embedding_decontaminate(corpus, ev, "id", "emb", threshold=0.9, num_planes=None)
    kept = {r["id"] for r in surv.collect()}
    contaminated = {cid for cid, _ in truth}
    assert kept == {cid for cid, _ in corpus_rows} - contaminated
    assert surv.columns == corpus.columns

    # num_planes=0 is neither the LSH path nor the documented exact
    # escape hatch — it must fail loudly, not silently pick one
    for fn in (
        lambda: dedup.embedding_cosine_pairs(corpus, "id", "emb", num_planes=0),
        lambda: dedup.embedding_cross_pairs(corpus, ev, "id", "emb", num_planes=0),
    ):
        with pytest.raises(ValueError, match="num_planes"):
            fn()


def _make_bmp(pixels, bpp=24, top_down=False):
    """Build a real uncompressed BMP from a top-down 2D list of gray
    values (each pixel stored as equal B=G=R[, A=0])."""
    import struct

    h = len(pixels)
    w = len(pixels[0])
    step = bpp // 8
    stride = ((w * step + 3) // 4) * 4
    rows = pixels if top_down else pixels[::-1]
    body = b""
    for row in rows:
        line = b"".join(bytes([v] * 3) + (b"\x00" if step == 4 else b"") for v in row)
        body += line + b"\x00" * (stride - len(line))
    height_field = -h if top_down else h
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, bpp, 0, len(body), 0, 0, 0, 0)
    return hdr + dib + body


def test_ahash_local_bmp_decode():
    """r8: dependency-free BMP raster decode + average hash — bottom-up /
    top-down / 32bpp / row padding all converge on identical grayscale,
    hence identical hashes."""
    import numpy as np

    px = [[(r * 16 + c * 7) % 256 for c in range(8)] for r in range(8)]
    base = multimodal.ahash_local(_make_bmp(px))
    assert base is not None
    assert base == multimodal.ahash_local(_make_bmp(px, top_down=True))
    assert base == multimodal.ahash_local(_make_bmp(px, bpp=32))
    # 10-wide image exercises the 2-byte row padding (10*3=30 -> stride 32)
    px10 = [[(r * 16 + c * 7) % 256 for c in range(10)] for r in range(8)]
    assert multimodal.ahash_local(_make_bmp(px10)) is not None
    g = multimodal.decode_bmp_gray_local(_make_bmp(px10))
    assert g.shape == (8, 10) and g[0][0] == px10[0][0] and g[7][9] == px10[7][9]
    # hand-check the hash definition on the 8x8: block==pixel, MSB-first
    flat = np.array(px, dtype=float).flatten()
    mean = flat.mean()
    expect = 0
    for v in flat:
        expect = (expect << 1) | int(v >= mean)
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert base == expect
    # unsupported inputs are None, not garbage
    assert multimodal.ahash_local(None) is None
    assert multimodal.ahash_local(b"not an image") is None
    assert multimodal.ahash_local(_make_bmp(px)[:40]) is None
    with pytest.raises(ValueError, match="hash_size"):
        multimodal.ahash_local(_make_bmp(px), hash_size=9)


def test_image_ahash_and_hamming_pairs(spark):
    """r8: distributed ahash == local replay, and near-duplicate images
    surface through the SAME pigeonhole banding as text SimHash."""
    import random

    random.seed(11)
    base_px = [[random.randrange(256) for _ in range(16)] for _ in range(16)]
    # near-dup: tweak one pixel slightly; far: independent random image
    near_px = [row[:] for row in base_px]
    near_px[3][3] = (near_px[3][3] + 4) % 256
    far_px = [[random.randrange(256) for _ in range(16)] for _ in range(16)]
    rows = [
        (0, bytearray(_make_bmp(base_px))),
        (1, bytearray(_make_bmp(near_px))),
        (2, bytearray(_make_bmp(far_px))),
        (3, None),
        (4, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["id"]: r["ahash"] for r in multimodal.image_ahash(df, "content", "doc_id").collect()}
    for i, b in rows:
        expect = multimodal.ahash_local(bytes(b) if b is not None else None)
        assert out[i] == expect, f"row {i}"
    assert out[3] is None and out[4] is None
    # composition: hamming_pairs over the signatures buckets the near-dup
    sigs = multimodal.image_ahash(df, "content", "doc_id")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.hamming_pairs(sigs, "id", "ahash", max_hamming=3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] <= 3
    assert (0, 2) not in pairs and (1, 2) not in pairs


def _make_wav(samples, channels=1, bits=16, sr=8000, fmt=1):
    """Real RIFF/WAVE with 16-bit PCM payload from a list of ints (mono)
    or per-channel tuples."""
    import struct

    frames = b""
    for s in samples:
        vals = s if isinstance(s, tuple) else (s,) * channels
        frames += b"".join(struct.pack("<h", v) for v in vals)
    fmt_chunk = struct.pack("<HHIIHH", fmt, channels, sr, sr * channels * bits // 8, channels * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    body += b"data" + struct.pack("<I", len(frames)) + frames
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_audio_energy_hash_local():
    """r8: pure-numpy PCM decode + windowed-energy hash — loud/quiet
    alternation produces the expected bit pattern; stereo averages to
    mono; unsupported formats are None."""
    import numpy as np

    # 8 windows x 8 samples: windows alternate loud (1000) / quiet (10)
    samples = []
    for w in range(8):
        samples += [1000 if w % 2 == 0 else 10] * 8
    wav = _make_wav(samples)
    h = multimodal.audio_energy_hash_local(wav, num_windows=8)
    # bits MSB-first: 10101010 -> 0xAA
    assert h == 0b10101010
    # stereo: (L+R)/2 equals the mono signal -> identical hash
    stereo = _make_wav([(s + 2, s - 2) for s in samples], channels=2)
    assert multimodal.audio_energy_hash_local(stereo, num_windows=8) == h
    mono = multimodal.decode_wav_pcm_local(wav)
    assert len(mono) == 64 and mono[0] == 1000.0
    # non-PCM format tag, truncated data, junk: all None
    assert multimodal.audio_energy_hash_local(_make_wav(samples, fmt=3)) is None
    assert multimodal.audio_energy_hash_local(wav[:50], num_windows=8) is None
    assert multimodal.audio_energy_hash_local(b"junk") is None
    assert multimodal.audio_energy_hash_local(None) is None
    with pytest.raises(ValueError, match="num_windows"):
        multimodal.audio_energy_hash_local(wav, num_windows=65)


def test_audio_energy_hash_spark_and_pairs(spark):
    """r8: distributed == local, and near-dup audio rides hamming_pairs."""
    import random

    random.seed(3)
    base = [random.randrange(-3000, 3000) for _ in range(256)]
    near = base[:]
    near[10] += 40  # tiny amplitude nudge
    far = [random.randrange(-3000, 3000) for _ in range(256)]
    rows = [
        (0, bytearray(_make_wav(base))),
        (1, bytearray(_make_wav(near))),
        (2, bytearray(_make_wav(far))),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["id"]: r["audio_hash"] for r in multimodal.audio_energy_hash(df, "content", "doc_id").collect()}
    for i, b in rows:
        assert out[i] == multimodal.audio_energy_hash_local(bytes(b) if b is not None else None)
    sigs = multimodal.audio_energy_hash(df, "content", "doc_id")
    pairs = {
        (r["id_a"], r["id_b"]) for r in dedup.hamming_pairs(sigs, "id", "audio_hash", max_hamming=3).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_strip_html(spark):
    """r8: regex-tier HTML extraction — script/style/comment blocks die
    wholesale, block tags become line breaks, entities decode with
    double-escapes preserved, null stays null."""
    html = (
        "<html><head><style>p {color: red}</style>"
        "<script type='text/js'>var x = '<p>not text</p>';</script></head>"
        "<body><h1>Title</h1><p>First &amp; second &lt;para&gt;.</p>"
        "<!-- hidden comment --><div>Item&nbsp;one</div>"
        "<ul><li>a</li><li>b</li></ul>"
        "<span class='x'>inline &amp;lt; stays escaped</span></body></html>"
    )
    df = spark.createDataFrame([(0, html), (1, "plain, no markup"), (2, None)], "id long, t string")
    out = {r["id"]: r["s"] for r in df.select("id", text.strip_html("t").alias("s")).collect()}
    got = out[0]
    assert "Title" in got and "First & second <para>." in got
    assert "color" not in got and "var x" not in got and "hidden comment" not in got
    assert "Item one" in got
    # block tags introduced real line structure
    lines = [ln for ln in got.split("\n") if ln.strip()]
    assert "Title" in lines[0]
    assert any(ln.strip() == "a" for ln in lines) and any(ln.strip() == "b" for ln in lines)
    # double-escaped text stays escaped (&amp; decodes LAST)
    assert "inline &lt; stays escaped" in got
    assert out[1] == "plain, no markup"
    assert out[2] is None
    # decode_entities=False leaves entities literal but still untags
    raw = df.where("id = 0").select(text.strip_html("t", decode_entities=False).alias("s")).collect()[0]["s"]
    assert "&amp;" in raw and "<p>" not in raw


def test_extract_links(spark):
    """r8: href/src extraction across quote styles; fragments and empties
    excluded; null-safe; composes with url_host for outlink domains."""
    from dqx_spark.pipeline import web

    html = (
        '<a href="https://a.example.com/x?q=1">x</a> '
        "<img SRC='/img/y.png'/> <a href=bare.html>b</a> "
        '<a href="#top">top</a> <a href="">e</a> <link HREF="https://b.org/c.css">'
    )
    df = spark.createDataFrame([(0, html), (1, "no links here"), (2, None)], "id long, t string")
    out = {r["id"]: r["links"] for r in df.select("id", web.extract_links("t").alias("links")).collect()}
    assert out[0] == ["https://a.example.com/x?q=1", "/img/y.png", "bare.html", "https://b.org/c.css"]
    assert out[1] == [] and out[2] == []
    # attr subset: href only drops the img src
    hrefs = df.where("id = 0").select(web.extract_links("t", attrs=("href",)).alias("l")).collect()[0]["l"]
    assert "/img/y.png" not in hrefs and "bare.html" in hrefs
    # outlink hosts via the existing url_host composition
    hosts = (
        df.select(F.explode(web.extract_links("t")).alias("u"))
        .select(web.url_host("u").alias("h"))
        .where("h <> ''")
        .distinct()
        .collect()
    )
    assert {r["h"] for r in hosts} == {"a.example.com", "b.org"}
    import pytest as _pt

    with _pt.raises(ValueError, match="attribute"):
        df.select(web.extract_links("t", attrs=("href", "bad attr")))


def test_hamming_pairs_edges_and_synthesize_bmp(spark):
    """r8 review fixes: max_hamming=0 is exact-signature grouping (the
    (1<<64)-1 mask overflowed a Java long before); negative args raise;
    hash_size validation rejects negatives; the shared synthesize_bmp
    builder emits byte-identical files to the local reference builder,
    including padded widths."""
    sigs = spark.createDataFrame(
        [(0, 5), (1, 5), (2, 7), (3, None)], "id long, sh long"
    )
    exact = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.hamming_pairs(sigs, "id", "sh", max_hamming=0).collect()
    }
    assert exact == {(0, 1): 0}
    import pytest as _pt

    with _pt.raises(ValueError, match="max_hamming"):
        dedup.hamming_pairs(sigs, "id", "sh", max_hamming=-1)
    with _pt.raises(ValueError, match="nbits"):
        dedup.hamming_pairs(sigs, "id", "sh", nbits=65)
    with _pt.raises(ValueError, match="hash_size"):
        multimodal.ahash_local(b"x", hash_size=-8)
    with _pt.raises(ValueError, match="hash_size"):
        multimodal.image_ahash(sigs, "sh", "id", hash_size=-8)

    # shared builder == local reference builder, byte for byte
    df = spark.createDataFrame([(3,)], "doc_id long")
    k = F.col("doc_id")
    built = df.select(
        multimodal.synthesize_bmp(lambda y, x: (k * 31 + y * 16 + x * 7) % 256).alias("b")
    ).collect()[0]["b"]
    px = [[(3 * 31 + y * 16 + x * 7) % 256 for x in range(8)] for y in range(8)]
    assert bytes(built) == _make_bmp(px)
    # padded width (10*3=30 -> stride 32) still decodes to the same grays
    built10 = df.select(
        multimodal.synthesize_bmp(lambda y, x: (k + y * 10 + x) % 256, width=10, height=4).alias("b")
    ).collect()[0]["b"]
    g = multimodal.decode_bmp_gray_local(bytes(built10))
    assert g.shape == (4, 10) and g[0][0] == 3 % 256 and g[3][9] == (3 + 39) % 256


def test_extract_links_skips_data_attributes(spark):
    """r8 review fix: data-src/data-href lazy-loading attributes are NOT
    the real link attributes and must not match."""
    from dqx_spark.pipeline import web

    html = '<img src="placeholder.gif" data-src="real.jpg"> <a data-href="x.html" href="y.html">'
    df = spark.createDataFrame([(0, html)], "id long, t string")
    links = df.select(web.extract_links("t").alias("l")).collect()[0]["l"]
    assert links == ["placeholder.gif", "y.html"]


def test_dhash_local_and_spark(spark):
    """r8: difference hash — gradient-sign semantics (monotone ramps
    saturate the bits), width guard, Spark parity, brightness-shift
    invariance shared with aHash."""
    # 8x9 left-to-right increasing ramp: every horizontal gradient is
    # positive -> all 64 bits set -> signed -1
    ramp = [[c * 10 for c in range(9)] for _ in range(8)]
    assert multimodal.dhash_local(_make_bmp(ramp)) == -1
    # decreasing ramp -> no bit set
    fall = [[240 - c * 10 for c in range(9)] for _ in range(8)]
    assert multimodal.dhash_local(_make_bmp(fall)) == 0
    # gradients survive a global brightness shift (the dHash property)
    shifted = [[min(255, v + 15) for v in row] for row in ramp]
    assert multimodal.dhash_local(_make_bmp(shifted)) == -1
    # an 8-wide image cannot host 9 horizontal blocks
    assert multimodal.dhash_local(_make_bmp([[0] * 8] * 8)) is None
    import pytest as _pt

    with _pt.raises(ValueError, match="hash_size"):
        multimodal.dhash_local(b"x", hash_size=0)

    rows = [(0, bytearray(_make_bmp(ramp))), (1, bytearray(_make_bmp(fall))), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["id"]: r["dhash"] for r in multimodal.image_dhash(df, "content", "doc_id").collect()}
    assert out == {0: -1, 1: 0, 2: None}


def test_phash_local_and_spark(spark):
    """r8: DCT perceptual hash — constant images hash to 0 (no non-DC
    energy), a pure horizontal cosine lights exactly its own frequency
    bit, small pixel noise stays within a small Hamming radius, and the
    local byte builder twin matches both the test builder and the Column
    builder."""
    import math
    import random

    # constant image: every non-DC coefficient is 0 -> median 0 -> no
    # strict > -> hash 0
    flat = [[128] * 32 for _ in range(32)]
    assert multimodal.phash_local(_make_bmp(flat)) == 0

    # horizontal cosine at frequency 3: dominant coefficient at (0, 3) ->
    # among the 63 kept coefficients only index (0,3) clears the median
    cosy = [
        [int(round(128 + 100 * math.cos(math.pi * (2 * x + 1) * 3 / 64))) for x in range(32)]
        for _ in range(32)
    ]
    h = multimodal.phash_local(_make_bmp(cosy))
    # coefficient order after dropping DC: (0,1),(0,2),(0,3),... -> the
    # dominant frequency is bit index 2; integer pixel rounding leaks a
    # little energy elsewhere, so allow a few minor bits alongside it
    assert (h >> (62 - 2)) & 1 == 1  # 63 bits packed: element i -> position 62-i
    assert bin(h).count("1") <= 5

    # noise robustness: +-2 jitter moves few bits; a different random
    # image moves many
    random.seed(5)
    base = [[random.randrange(256) for _ in range(32)] for _ in range(32)]
    noisy = [[min(255, max(0, v + random.randrange(-2, 3))) for v in row] for row in base]
    other = [[random.randrange(256) for _ in range(32)] for _ in range(32)]
    hb = multimodal.phash_local(_make_bmp(base))
    d_noise = bin(hb ^ multimodal.phash_local(_make_bmp(noisy))).count("1")
    d_other = bin(hb ^ multimodal.phash_local(_make_bmp(other))).count("1")
    assert d_noise <= 8 and d_other > d_noise

    assert multimodal.phash_local(None) is None
    assert multimodal.phash_local(b"junk") is None
    import pytest as _pt

    with _pt.raises(ValueError, match="hash_size"):
        multimodal.phash_local(_make_bmp(flat), hash_size=9)
    with _pt.raises(ValueError, match="dct_size"):
        multimodal.phash_local(_make_bmp(flat), dct_size=4)

    # byte-builder twin: local == test helper == Column builder
    px = [[(y * 7 + x * 3) % 256 for x in range(10)] for y in range(4)]
    assert multimodal.synthesize_bmp_local(px) == _make_bmp(px)

    rows = [(0, bytearray(_make_bmp(base))), (1, None)]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["id"]: r["phash"] for r in multimodal.image_phash(df, "content", "doc_id").collect()}
    assert out[0] == hb and out[1] is None


def test_ivfpq_topk_join_parity_and_recall(spark):
    """r9: the distributed BATCH IVFADC join — (a) bit-for-bit equal to
    running single-query ivfpq_topk per query (same probe/LUT/ADC/rerank
    IEEE op order, now computed as Columns instead of driver literals),
    in BOTH residual and raw modes; (b) mean recall@10 vs the exact L2
    top-k clears the ivfpq floor (0.85); (c) NULL query vectors drop."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    cents = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, max_iter=50, n_init=20,
        sample_order_by="vec_id",
    )
    indexed = similarity.ivf_assign_buckets(df, cents, "embedding", "vec_id")
    books = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=16, num_centroids=16, seed=42,
        max_iter=25, n_init=4, sample_order_by="vec_id", residual_centroids=cents,
    )
    enc = similarity.pq_encode(indexed, books, "vec", "id", residual_centroids=cents)
    enc = enc.localCheckpoint()

    qids = [0, 7, 13, 21, 33]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.where(F.col("vec_id").isin(qids)).collect()
    }
    queries = df.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    got = similarity.ivfpq_topk_join(
        queries, enc, cents, books, "embedding", "qid", k=10, n_probe=6, rerank_r=50
    )
    jr = {(r["query_id"], r["rank"]): (r["id"], r["dist"]) for r in got.collect()}
    recalls = []
    for qid, qv in qvecs.items():
        single = similarity.ivfpq_topk(
            enc, cents, books, qv, k=10, n_probe=6, rerank_r=50
        ).collect()
        for r in single:
            assert jr[(qid, r["rank"])] == (r["id"], r["dist"])  # bit-exact
        qlit = F.array(*[F.lit(float(x)) for x in qv])
        l2 = F.aggregate(
            F.zip_with(F.col("embedding").cast("array<double>"), qlit, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        exact = {
            r["vec_id"]
            for r in df.select("vec_id", l2.alias("d")).orderBy("d", "vec_id").limit(10).collect()
        }
        recalls.append(len(exact & {i for (q, _), (i, _) in jr.items() if q == qid}) / 10)
    assert sum(recalls) / len(recalls) >= 0.85, f"batch-join recall@10 {recalls}"

    # raw (non-residual) mode parity on the same index layout
    books_raw = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=16, num_centroids=16, seed=42,
        max_iter=25, n_init=4, sample_order_by="vec_id",
    )
    enc_raw = (
        similarity.pq_encode(df, books_raw, "embedding", "vec_id")
        .join(indexed.select("id", "ivf_bucket"), "id")
        .localCheckpoint()
    )
    j2 = {
        (r["query_id"], r["rank"]): (r["id"], r["dist"])
        for r in similarity.ivfpq_topk_join(
            queries, enc_raw, cents, books_raw, "embedding", "qid",
            k=10, n_probe=6, rerank_r=50, residual=False,
        ).collect()
    }
    for qid, qv in list(qvecs.items())[:2]:
        single = similarity.ivfpq_topk(
            enc_raw, cents, books_raw, qv, k=10, n_probe=6, rerank_r=50, residual=False
        ).collect()
        for r in single:
            assert j2[(qid, r["rank"])] == (r["id"], r["dist"])

    # NULL query vectors are dropped, not propagated
    qnull = spark.createDataFrame([(99, None)], "qid long, embedding array<float>")
    assert similarity.ivfpq_topk_join(
        qnull, enc, cents, books, "embedding", "qid", k=5, n_probe=2
    ).count() == 0
    df.unpersist()


def test_ivf_topk_join_parity(spark):
    """r9: the no-PQ batch member — ivf_topk_join bit-equals per-query
    ivf_topk (same Column probe assignment as the IVFADC join, exact
    cosine within probed cells, same (score desc, id asc) tiebreak)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    indexed = similarity.ivf_assign_buckets(df, cents, "embedding", "vec_id").localCheckpoint()
    qids = [0, 7, 13]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.where(F.col("vec_id").isin(qids)).collect()
    }
    queries = df.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    jr = {
        (r["query_id"], r["rank"]): (r["id"], r["score"])
        for r in similarity.ivf_topk_join(
            queries, indexed, cents, "embedding", "qid", k=10, n_probe=5
        ).collect()
    }
    assert len(jr) == 30
    for qid, qv in qvecs.items():
        for r in similarity.ivf_topk(indexed, cents, qv, k=10, n_probe=5).collect():
            assert jr[(qid, r["rank"])] == (r["id"], r["score"])


def test_ann_index_save_load_partition_pruning(spark, tmp_path):
    """r9: save_ann_index writes the billion-scale layout (corpus
    partitioned by ivf_bucket + sidecar metadata) and load_ann_index
    restores it with the codebook mode tag intact.  The probed search on
    the LOADED index must match the in-memory search result AND prune at
    the parquet partition level (PartitionFilters in the scan) — the
    pruning lever the in-memory path only approximates post-scan."""
    import contextlib
    import io
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = similarity.ivf_train_centroids(
        df, "embedding", n_centroids=8, seed=42, sample_order_by="vec_id"
    )
    indexed = similarity.ivf_assign_buckets(df, cents, "embedding", "vec_id")
    books = similarity.pq_train_codebooks(
        df, "embedding", dim=64, num_subvectors=16, num_centroids=16, seed=42,
        max_iter=25, n_init=4, sample_order_by="vec_id", residual_centroids=cents,
    )
    enc = similarity.pq_encode(indexed, books, "vec", "id", residual_centroids=cents)

    path = str(tmp_path / "ann_index")
    similarity.save_ann_index(enc, path, cents, books)
    loaded, cents2, books2 = similarity.load_ann_index(spark, path)
    assert cents2 == cents
    assert books2 == list(books) and books2.residual_trained is True

    qv = [float(x) for x in df.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    mem = [
        (r["id"], r["rank"], r["dist"])
        for r in similarity.ivfpq_topk(enc, cents, books, qv, k=10, n_probe=6, rerank_r=50).collect()
    ]
    disk_df = similarity.ivfpq_topk(loaded, cents2, books2, qv, k=10, n_probe=6, rerank_r=50)
    assert [(r["id"], r["rank"], r["dist"]) for r in disk_df.collect()] == mem

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        disk_df.explain("formatted")
    p = buf.getvalue()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]+)\]", p)
    assert m and "ivf_bucket" in m.group(1), f"partition pruning missing: {m}"

    # r9 review: append/ignore could pair stale bucket assignments with a
    # fresh sidecar - rejected up front
    import pytest as _pytest

    with _pytest.raises(ValueError, match="desynchronize"):
        similarity.save_ann_index(enc, path, cents, books, mode="append")
    # untagged plain-list books round-trip UNtagged (fabricating False
    # would hard-fail a working residual search after reload)
    plain = [list(b) for b in books]
    path2 = str(tmp_path / "ann_index_plain")
    similarity.save_ann_index(enc, path2, cents, plain)
    _, _, books3 = similarity.load_ann_index(spark, path2)
    assert books3 == plain and not isinstance(books3, similarity.PQCodebooks)


def test_ann_lsh_topk_join_parity(spark):
    """r9: the LSH batch member — ann_lsh_topk_join bit-equals per-query
    ann_lsh_topk (same bucket expressions, same single-bit-flip probe
    enumeration, same exact-cosine rerank and tiebreak)."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 7, 13]
    qvecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.where(F.col("vec_id").isin(qids)).collect()
    }
    queries = df.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    jr = {
        (r["query_id"], r["rank"]): (r["id"], r["score"])
        for r in similarity.ann_lsh_topk_join(
            queries, df, "embedding", "vec_id", "embedding", "qid", k=10
        ).collect()
    }
    assert len(jr) == 30
    for qid, qv in qvecs.items():
        for r in similarity.ann_lsh_topk(df, qv, "embedding", "vec_id", k=10).collect():
            assert jr[(qid, r["rank"])] == (r["id"], r["score"])
    # multiprobe=0: exact-bucket-only probes, still parity
    j0 = {
        (r["query_id"], r["rank"]): r["id"]
        for r in similarity.ann_lsh_topk_join(
            queries, df, "embedding", "vec_id", "embedding", "qid", k=5, multiprobe=0
        ).collect()
    }
    for qid, qv in list(qvecs.items())[:1]:
        for r in similarity.ann_lsh_topk(df, qv, "embedding", "vec_id", k=5, multiprobe=0).collect():
            assert j0[(qid, r["rank"])] == r["id"]


def test_lsh_index_save_load_join_parity(spark, tmp_path):
    """r10 (VERDICT r9 #3): the persisted LSH melt is bit-equivalent to the
    in-memory path — ann_lsh_topk_join over a load_lsh_index corpus returns
    exactly the in-memory result (melt deterministic in (vec, seed)), with
    one fewer corpus scan per query batch; family-tag cross-loads raise."""
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR_TESTS", "/root/testdata/sf0.001")
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    mem = sorted(
        (r["query_id"], r["rank"], r["id"], r["score"])
        for r in similarity.ann_lsh_topk_join(
            queries, df, "embedding", "vec_id", "qv", "qid",
            k=5, num_planes=6, num_tables=4, seed=7,
        ).collect()
    )
    path = str(tmp_path / "lsh_index")
    similarity.save_lsh_index(df, path, "embedding", "vec_id", num_planes=6, num_tables=4, seed=7)
    idx = similarity.load_lsh_index(spark, path)
    # knob args deliberately DIFFER: the sidecar must override them
    disk = sorted(
        (r["query_id"], r["rank"], r["id"], r["score"])
        for r in similarity.ann_lsh_topk_join(
            queries, None, "", "", "qv", "qid", k=5, corpus_index=idx
        ).collect()
    )
    assert disk == mem and len(mem) == 15

    with pytest.raises(ValueError, match="use load_lsh_index"):
        similarity.load_ann_index(spark, path)
    with pytest.raises(ValueError, match="desynchronize"):
        similarity.save_lsh_index(df, path, "embedding", "vec_id", mode="append")
    with pytest.raises(ValueError, match="65536"):
        similarity.save_lsh_index(df, str(tmp_path / "x"), "embedding", "vec_id",
                                  num_planes=16, num_tables=2, layout="bucketed")

    # r11 (VERDICT r10 #5): layout=None self-selects — flat at this scale
    # (melt rows far below the 1M threshold), recorded in the sidecar so
    # append/compact/probe follow it; explicit 'bucketed' still honored
    # (the plan test pins its pruning); auto past the 65536-dir cap falls
    # back to flat instead of raising.
    assert idx.meta["layout"] == "flat"
    auto_big = str(tmp_path / "auto_big")
    similarity.save_lsh_index(df.limit(5), auto_big, "embedding", "vec_id",
                              num_planes=16, num_tables=2)
    assert similarity.load_lsh_index(spark, auto_big).meta["layout"] == "flat"
