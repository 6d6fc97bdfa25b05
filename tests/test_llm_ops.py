"""Unit tests for the LLM-data-pipeline operators (dedup, similarity,
text analysis, multimodal plumbing)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_workflow_spark.operators import dedup as D
from etl_workflow_spark.operators import multimodal as M
from etl_workflow_spark.operators import similarity as S
from etl_workflow_spark.operators import text as T


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# ------------------------------------------------------------------ dedup


def test_exact_dedup_normalizes_whitespace_and_case(spark):
    df = _docs(
        spark,
        [(1, "Hello  World"), (2, "hello world"), (3, "different doc entirely")],
    )
    out = D.exact_dedup(df).collect()
    by_keeper = {r["keeper_id"]: r["n_copies"] for r in out}
    assert by_keeper == {1: 2, 3: 1}  # 1 and 2 collapse; min id wins


def test_ngram_jaccard_identical_and_disjoint(spark):
    a = "the quick brown fox jumps over the lazy dog today"
    b = "the quick brown fox jumps over the lazy dog tonight"  # near-dup
    c = "completely unrelated words appear in this one sentence here"
    df = _docs(spark, [(1, a), (2, b), (3, c)])
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard_e4"]
             for r in D.ngram_jaccard_pairs(df, threshold=0.1).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 5000
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_planted_near_dup(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("kappa", "lambda", 1)
    other = "one two three four five six seven eight nine ten " * 5
    df = _docs(spark, [(1, base), (2, near), (3, other)])
    pairs = {(r["doc_a"], r["doc_b"]) for r in
             D.minhash_lsh_pairs(df, threshold=0.4).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_minhash_agrees_with_exact_jaccard_on_testdata(spark, sf_dir):
    """LSH candidates verified by exact Jaccard must equal the exact
    pairwise result at a threshold where recall is ~1 (near-identical
    planted dups -> collision probability ≈ 1)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    exact = {(r["doc_a"], r["doc_b"]) for r in
             D.ngram_jaccard_pairs(docs, threshold=0.9).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in
           D.minhash_lsh_pairs(docs, threshold=0.9).collect()}
    assert lsh == exact and len(exact) > 0


def test_simhash_near_dup_small_hamming(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    near = base.replace("kappa", "lambda", 1)
    other = "one two three four five six seven eight nine ten " * 5
    df = _docs(spark, [(1, base), (2, near), (3, other)])
    fps = D.simhash(df)
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in D.hamming_pairs(fps, max_distance=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


# ------------------------------------------------------------------ text


def test_token_count_empty_and_simple(spark):
    df = _docs(spark, [(1, "one two three"), (2, ""), (3, "   ")])
    out = {r["doc_id"]: r["n_tokens"] for r in T.token_count(df).collect()}
    assert out == {1: 3, 2: 0, 3: 0}


def test_text_quality_ratios(spark):
    df = _docs(spark, [(1, "the cat sat on a mat.")])
    r = T.text_quality(df).collect()[0]
    assert r["n_words"] == 6
    # stopwords: 'the', 'a' -> 2/6 -> floor(20000/6) = 3333 in e4 units
    assert r["stopword_ratio_e4"] == 2 * 10000 // 6
    assert r["punct_ratio_e4"] > 0
    assert r["passes_quality"]


def test_lang_id_picks_marker_language(spark):
    df = _docs(
        spark,
        [(1, "el perro y la casa de que"), (2, "the dog and a cat of note"),
         (3, "xyzzy plugh qwerty")],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in T.lang_id(df).collect()}
    assert out == {1: "es", 2: "en", 3: "und"}


def test_fingerprint_stable_under_whitespace(spark):
    df = _docs(spark, [(1, "Hello   World"), (2, "  hello world ")])
    fps = [r["fingerprint"] for r in T.fingerprint(df).collect()]
    assert fps[0] == fps[1]


def test_fuzzy_name_search_ranks_typo_match_first(spark):
    parts = spark.createDataFrame(
        [
            Row(p_partkey=1, p_name="small ring"),
            Row(p_partkey=2, p_name="red widget"),
            Row(p_partkey=3, p_name="small gizmo"),
        ]
    )
    out = T.fuzzy_name_search(parts, "smal ring", k=3, min_sim_e4=0).collect()
    # exact-typo target first; the other "small" product beats the
    # trigram-disjoint one
    assert [r["p_partkey"] for r in out][0] == 1
    assert out[0]["sim_e4"] > out[1]["sim_e4"]
    # identical query/name => Jaccard 1.0 exactly (fixed point 10000)
    exact = T.fuzzy_name_search(parts, "small ring", k=1, min_sim_e4=0).collect()
    assert exact[0]["sim_e4"] == 10000


# ------------------------------------------------------------------ similarity


def test_cosine_topk_exact_small(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),   # closest to 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),  # farthest from 0
    ]
    emb = spark.createDataFrame(rows)
    q = emb.where("vec_id = 0").withColumnRenamed("vec_id", "query_id")
    out = S.brute_force_topk(emb, q, k=3).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]
    assert out[0]["rank"] == 1
    expected = 0.9 / math.sqrt(0.81 + 0.01)
    assert out[0]["score_e4"] == math.floor(expected * 10000)


def test_lsh_topk_recall_on_testdata(spark, sf_dir):
    """LSH top-k must recover most of the exact top-k (recall ≥ 0.5 on
    the 64-dim testdata with 16 planes / 4 bands)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, k=5).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in S.lsh_topk(emb, q, k=5).collect()}
    assert len(approx & exact) / len(exact) >= 0.5


# ------------------------------------------------------------------ multimodal


def test_decode_media_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_media(b"bytes", allow_fake=False)


def _make_png(w: int, h: int, color=(255, 0, 0)) -> bytes:
    """Minimal valid RGB PNG from the stdlib alone (zlib + struct):
    real test payloads without any codec dependency."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(color) * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_decode_media_png_header_tier(spark):
    """r10 verdict task #6: a REAL decode path behind the boundary —
    PNG dimensions parse from the IHDR header with the stdlib, no
    codec library, so a real image payload yields its true size even
    in this container (and the tier outranks the fake: allow_fake has
    no effect on a decodable payload)."""
    png = _make_png(37, 21)
    for fake in (False, True):
        meta = M.decode_media(png, allow_fake=fake)
        assert (meta["width"], meta["height"], meta["n_frames"]) == (
            37, 21, 1,
        )
    # the distributed path picks the same tier
    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    row = M.extract_media_meta(df, allow_fake=False).collect()[0]
    assert (row["width"], row["height"], row["n_frames"]) == (37, 21, 1)
    # a truncated header is NOT silently fake-decoded
    with pytest.raises(NotImplementedError):
        M.decode_media(png[:20], allow_fake=False)


def test_resize_media_real_tier_or_loud_refusal(spark):
    """Real resize in EVERY container (r12): Pillow when importable,
    else the stdlib PNG codec — bytes in, PNG bytes out whose header
    says the target size, actual pixels resampled. The loud-refusal
    half moves to a payload NO tier can decode."""
    png = _make_png(37, 21)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    out = M.resize_media(df, 64, 48, allow_fake=False).collect()[0]
    assert M._png_ihdr(bytes(out["payload"])) == (64, 48)
    meta = M.decode_media(bytes(out["payload"]), allow_fake=False)
    assert meta["width"] == 64 and meta["height"] == 48
    # the resized pixels are real: a solid-red source stays solid red
    w, h, ch, px = M._png_decode(bytes(out["payload"]))
    assert (w, h, ch) == (64, 48, 3)
    assert set(zip(px[0::3], px[1::3], px[2::3])) == {(255, 0, 0)}
    # single-frame stills: the one frame really extracts
    frames = M.sample_frames(df, allow_fake=False).collect()
    assert [f["frame_idx"] for f in frames] == [0]
    assert M._png_ihdr(bytes(frames[0]["frame_payload"])) == (37, 21)
    # refuse-loudly contract now binds only where NO tier can decode
    junk = spark.createDataFrame(
        [(1, bytearray(b"not an image at all"))],
        "doc_id long, payload binary",
    )
    with pytest.raises(Exception, match="not resizable"):
        M.resize_media(junk, 64, 48, allow_fake=False).collect()
    with pytest.raises(Exception, match="not decodable"):
        M.sample_frames(junk, allow_fake=False).collect()


def test_stdlib_png_codec_round_trips_every_filter():
    """The stdlib decode tier implements the full PNG filter spec, not
    just the filter-0 subset our own encoder writes: for each filter
    type 0..4, forward-filter a known RGB image per the spec, wrap it
    in IHDR/IDAT/IEND, and assert _png_decode recovers the exact
    pixels. Also: gray/gray+alpha/RGBA channel counts, the
    encode→decode round-trip, and NN-resize identity at same size."""
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def png_with_filter(w, h, ch, ctype, pixels, ftype):
        stride = w * ch
        raw = bytearray()
        prev = bytes(stride)
        for y in range(h):
            line = pixels[y * stride:(y + 1) * stride]
            f = bytearray(line)
            if ftype == 1:
                for i in range(stride - 1, ch - 1, -1):
                    f[i] = (f[i] - line[i - ch]) & 0xFF
            elif ftype == 2:
                for i in range(stride):
                    f[i] = (f[i] - prev[i]) & 0xFF
            elif ftype == 3:
                for i in range(stride):
                    a = line[i - ch] if i >= ch else 0
                    f[i] = (f[i] - ((a + prev[i]) >> 1)) & 0xFF
            elif ftype == 4:
                for i in range(stride):
                    a = line[i - ch] if i >= ch else 0
                    b = prev[i]
                    c = prev[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c
                    )
                    f[i] = (f[i] - pr) & 0xFF
            raw.append(ftype)
            raw.extend(f)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )

    w, h = 5, 4
    rgb = bytes(
        (x * 37 + y * 11 + c * 5) % 256
        for y in range(h) for x in range(w) for c in range(3)
    )
    for ftype in range(5):
        payload = png_with_filter(w, h, 3, 2, rgb, ftype)
        got = M._png_decode(payload)
        assert got is not None, f"filter {ftype} not decoded"
        assert got[:3] == (w, h, 3)
        assert bytes(got[3]) == rgb, f"filter {ftype} pixels wrong"
    # other color types round-trip through our encoder
    for ch in (1, 2, 4):
        px = bytes((i * 29) % 256 for i in range(w * h * ch))
        got = M._png_decode(M._png_encode(w, h, ch, px))
        assert got[:3] == (w, h, ch) and bytes(got[3]) == px
    # NN resize: identity at same size, block-exact at 2x down
    px = bytes((i * 3) % 256 for i in range(w * h * 3))
    assert M._nn_resize(w, h, 3, px, w, h) == px
    # non-PNG and interlaced/palette inputs refuse (None), not crash
    assert M._png_decode(b"nope") is None
    assert M._png_decode(png_with_filter(w, h, 3, 2, rgb, 0)[:20]) is None


def test_dhash_media_exact_replay_and_tiers(spark):
    """r13: perceptual dHash — exact per-row replay of the documented
    convention (bit y*8+x set iff the pixel outshines its right
    neighbor on the (9×8)-resampled grayscale) on a 9×8 gray-as-RGB
    image where EVERY tier's resample is the identity and luma is
    exact; the fake tier replays its SQL-castable 60-bit digest; no
    tier raises loudly."""
    import hashlib as hl

    w, h = 9, 8
    vals = [[(13 * (x * x + 7 * y)) % 256 for x in range(w)]
            for y in range(h)]
    px = bytes(
        b for y in range(h) for x in range(w)
        for b in (vals[y][x],) * 3
    )
    png = M._png_encode(w, h, 3, px)
    expected = 0
    for y in range(8):
        for x in range(8):
            if vals[y][x] > vals[y][x + 1]:
                expected |= 1 << (y * 8 + x)
    if expected >= 1 << 63:
        expected -= 1 << 64
    df = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    got = M.dhash_media(df, allow_fake=False).collect()[0]
    assert got["dhash"] == expected
    # fake tier: the 60-bit sha digest prefix, exactly as the driver
    # gate's DuckDB twin recomputes it
    junk = b"not an image at all"
    jdf = spark.createDataFrame(
        [(2, bytearray(junk))], "doc_id long, payload binary"
    )
    fake = M.dhash_media(jdf).collect()[0]["dhash"]
    want = int.from_bytes(
        hl.sha256(junk + b":dhash64").digest()[:8], "big"
    ) >> 4
    assert fake == want == M._fake_dhash(junk)
    with pytest.raises(Exception, match="not hashable"):
        M.dhash_media(jdf, allow_fake=False).collect()
    with pytest.raises(ValueError, match="hash_size"):
        M.dhash_media(df, hash_size=9)


def test_image_neardup_pairs_planted_recall(spark):
    """r13: a one-pixel perturbation of a high-contrast image lands
    within Hamming distance of its source (planted near-dup recall
    through the pigeonhole bander); the inverted image — every
    gradient flipped — does not pair with either."""

    def block_png(invert: bool, poke: bool) -> bytes:
        w, h = 36, 32
        buf = bytearray()
        for py in range(h):
            for pxx in range(w):
                v = 200 if ((pxx // 4 + py // 4) % 2) else 40
                if invert:
                    v = 240 - v
                buf += bytes((v, v, v))
        if poke:  # one off-grid pixel, far below the 160 contrast
            i = (1 * 36 + 1) * 3
            buf[i:i + 3] = bytes((buf[i] + 1,) * 3)
        return M._png_encode(w, h, 3, bytes(buf))

    df = spark.createDataFrame(
        [
            (1, bytearray(block_png(False, False))),
            (2, bytearray(block_png(False, True))),
            (3, bytearray(block_png(True, False))),
        ],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.image_neardup_pairs(df, max_distance=3).collect()
    }
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] <= 3
    # the fingerprints really differ between original and inverse
    fps = {r["doc_id"]: r["dhash"]
           for r in M.dhash_media(df, allow_fake=False).collect()}
    assert bin((fps[1] ^ fps[3]) & ((1 << 64) - 1)).count("1") > 3
    # end-to-end keep policy: min-id keeps 1, drops 2, passes 3
    kept = {r["doc_id"] for r in M.dedup_images(df).collect()}
    assert kept == {1, 3}
    # quality policy: the perturbed copy outscores the original
    scored = df.withColumn(
        "quality", F.when(F.col("doc_id") == 2, 9.0).otherwise(1.0)
    )
    kept_q = {r["doc_id"]
              for r in M.dedup_images(scored, quality_col="quality")
              .collect()}
    assert kept_q == {2, 3}


def test_image_hashers_honor_string_id_col(spark):
    """r14 (verdict note #1): ``dhash_media``/``phash_media`` must
    emit the CALLER'S id column — name AND type preserved (string ids
    are common for image corpora), not a silently-renamed int64
    ``doc_id`` — and the pairing/dedup path must run end-to-end on a
    string-keyed frame."""
    junk_a = b"payload alpha, not an image"
    junk_b = b"payload beta, also not an image"
    df = spark.createDataFrame(
        [
            ("img-a", bytearray(junk_a)),
            ("img-b", bytearray(junk_a)),  # exact dup -> hamming 0
            ("img-c", bytearray(junk_b)),
        ],
        "image_id string, payload binary",
    )
    fps = M.dhash_media(df, id_col="image_id")
    assert fps.columns == ["image_id", "dhash"]
    assert dict(fps.dtypes)["image_id"] == "string"
    vals = {r["image_id"]: r["dhash"] for r in fps.collect()}
    assert vals["img-a"] == vals["img-b"] != vals["img-c"]
    pfs = M.phash_media(df, id_col="image_id")
    assert pfs.columns == ["image_id", "phash"]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in M.image_neardup_pairs(
            df, max_distance=3, id_col="image_id"
        ).collect()
    }
    assert pairs == {("img-a", "img-b"): 0}
    kept = {r["image_id"]
            for r in M.dedup_images(df, id_col="image_id").collect()}
    assert kept == {"img-a", "img-c"}
    # the id contract extends to the other multimodal stages (r14)
    meta = M.extract_media_meta(df, id_col="image_id")
    assert meta.columns[0] == "image_id"
    assert dict(meta.dtypes)["image_id"] == "string"
    assert meta.count() == 3
    rez = M.resize_media(df, 32, 32, id_col="image_id")
    assert rez.columns[0] == "image_id"
    assert rez.count() == 3
    fr = M.sample_frames(df, id_col="image_id")
    assert fr.columns[0] == "image_id"
    assert dict(fr.dtypes)["image_id"] == "string"
    assert fr.count() >= 3


def test_extract_media_meta_plumbing(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello"), Row(doc_id=2, text="x")])
    out = {r["doc_id"]: r for r in
           M.extract_media_meta(M.with_binary_payload(df)).collect()}
    assert out[1]["payload_bytes"] == 5
    import hashlib
    assert out[1]["checksum_sha256"] == hashlib.sha256(b"hello").hexdigest()
    assert 64 <= out[1]["width"] <= 255 and 1 <= out[1]["n_frames"] <= 8
    # deterministic across runs
    again = {r["doc_id"]: r for r in
             M.extract_media_meta(M.with_binary_payload(df)).collect()}
    assert out[1]["width"] == again[1]["width"]

def test_resize_media_deterministic_and_shaped(spark, sf_dir):
    docs = M.with_binary_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    )
    a = M.resize_media(docs, 224, 224).collect()
    b = M.resize_media(docs, 224, 224).collect()
    assert len(a) == 20
    assert {r.width for r in a} == {224} and {r.height for r in a} == {224}
    assert sorted((r.doc_id, bytes(r.payload)) for r in a) == sorted(
        (r.doc_id, bytes(r.payload)) for r in b
    )
    # different target dims -> different payloads
    c = M.resize_media(docs, 64, 64).collect()
    assert sorted(bytes(r.payload) for r in a) != sorted(bytes(r.payload) for r in c)


def test_sample_frames_fanout(spark, sf_dir):
    docs = M.with_binary_payload(
        spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    )
    meta = {r.doc_id: r.n_frames for r in M.extract_media_meta(
        docs, media_type="video").collect()}
    frames = M.sample_frames(docs, every_n=2).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    for doc_id, idxs in by_doc.items():
        expected = list(range(0, meta[doc_id], 2))
        assert sorted(idxs) == expected
    # frame payloads unique per (doc, idx)
    assert len({(r.doc_id, r.frame_idx) for r in frames}) == len(frames)


def test_ivf_topk_recall_on_testdata(spark, sf_dir):
    """IVF with 4/16 probes must recover a solid share of exact top-k;
    results are a subset of valid (query, neighbor) scored pairs."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in S.brute_force_topk(emb, q, k=5).collect()}
    ivf = S.ivf_topk(emb, q, k=5, n_cells=16, n_probe=4).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    assert len(got & exact) / len(exact) >= 0.5
    # scores must match the exact scorer where pairs overlap
    exact_scores = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
                    for r in S.brute_force_topk(emb, q, k=5).collect()}
    for r in ivf:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_scores:
            assert abs(r["score_e4"] - exact_scores[key]) <= 10


def test_repetition_signals_crafted_docs(spark):
    from etl_workflow_spark.operators.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one token dominates
            (2, "a b c d"),                       # all distinct
            (3, "x y x y x y"),                   # dominant bigram "x y"
            (4, "l1\nl2\nl1\nl1"),                # duplicate lines
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["top_token_fraction_e4"] == 10000
    assert got[1]["distinct_token_ratio_e4"] == 2500
    assert got[2]["distinct_token_ratio_e4"] == 10000
    assert got[2]["top_token_fraction_e4"] == 2500
    # "x y" occurs 3 times among 5 bigrams
    assert got[3]["top_2gram_fraction_e4"] == 6000
    # 4 lines, 2 distinct -> half duplicated
    assert got[4]["dup_line_fraction_e4"] == 5000
    assert got[1]["dup_line_fraction_e4"] == 0


# ---------------------------------------------------------- quantization


def test_quantize_embeddings_bounds_and_types(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, -0.5, 0.25]),
        Row(vec_id=1, embedding=[0.0, 0.0, 0.0]),     # all-zero
        Row(vec_id=2, embedding=[-3.0, 2.0, 0.1]),
    ]
    qe = S.quantize_embeddings(spark.createDataFrame(rows))
    assert qe.schema["qvec"].dataType.simpleString() == "array<tinyint>"
    got = {r["vec_id"]: r for r in qe.collect()}
    # all-zero vector: scale 1.0, stays all-zero
    assert got[1]["qscale"] == 1.0 and got[1]["qvec"] == [0, 0, 0]
    for r in got.values():
        s = r["qscale"]
        for v, q in zip(r["embedding"], r["qvec"]):
            assert -127 <= q <= 127
            # reconstruction error within half a quantization step
            assert abs(v - q * s) <= s / 2 + 1e-9
        # max-abs element quantizes to exactly +-127 (non-zero vectors)
        if any(v != 0 for v in r["embedding"]):
            assert max(abs(q) for q in r["qvec"]) == 127


def test_quantized_topk_recall_and_exact_rerank(spark, sf_dir):
    """int8 scan keeps recall high (measured 0.975 raw on the 64-dim
    testdata); float re-rank of 4x candidates restores exact scores on
    every returned pair."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id")
    exact = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
             for r in S.brute_force_topk(emb, q, k=5).collect()}
    raw = {(r["query_id"], r["neighbor_id"])
           for r in S.quantized_topk(emb, q, k=5, rerank_factor=1).collect()}
    assert len(raw & set(exact)) / len(exact) >= 0.8
    rr = S.quantized_topk(emb, q, k=5, rerank_factor=4).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in rr}
    assert len(got & set(exact)) / len(exact) >= len(raw & set(exact)) / len(exact)
    # re-ranked scores are EXACT — identical e4 fixed-point to the
    # brute-force float scorer for every overlapping pair
    for r in rr:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["score_e4"] == exact[key]


def test_quantized_topk_accepts_prequantized_corpus(spark, sf_dir):
    """The deployment shape: quantize once, probe many times — results
    identical to inline quantization."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 4").withColumnRenamed("vec_id", "query_id")
    pre = S.quantize_embeddings(emb)
    a = sorted(map(tuple, S.quantized_topk(pre, q, k=5).collect()))
    b = sorted(map(tuple, S.quantized_topk(emb, q, k=5).collect()))
    assert a == b


def test_pq_fit_model_contract(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=32)
    assert model["format"] == "spark-graft-ivfpq/v1"
    assert model["dim"] == 64 and model["dsub"] == 8
    assert len(model["coarse"]) == 8
    assert len(model["codebooks"]) == 8
    assert all(len(cb) == 32 for cb in model["codebooks"])
    assert all(len(e) == 8 for cb in model["codebooks"] for e in cb)
    import pytest

    with pytest.raises(ValueError, match="must divide"):
        S.pq_fit(emb, m_sub=7)
    with pytest.raises(ValueError, match="non-empty"):
        S.pq_fit(emb.where("vec_id < 0"))


def test_pq_flat_adc_recall_and_exact_scores(spark, sf_dir):
    """Flat ADC (scan all codes, ~8% of float bytes) + exact re-rank:
    recall@10 >= 0.9 on the isotropic testdata — the regime where NO
    cell-pruned tier can hold recall — and returned scores are
    identical to brute force for every overlapping pair."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id")
    model = S.pq_fit(emb, n_cells=16, m_sub=8, ksub=256)
    idx = S.pq_index(emb, model)
    assert dict(idx.dtypes) == {
        "vec_id": "bigint", "cell": "int", "codes": "array<smallint>"
    }
    exact = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
             for r in S.brute_force_topk(emb, q, k=10).collect()}
    got_rows = S.pq_topk(idx, q, model, emb, k=10, rerank_factor=8).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    assert len(got & set(exact)) / len(exact) >= 0.9
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["score_e4"] == exact[key]


def test_pq_topk_refuses_stale_index(spark, sf_dir, tmp_path):
    """An index encoded under one model probed with a DIFFERENT model
    would score garbage silently (codes stay in-range) — the model
    fingerprint is stamped into column metadata, survives parquet, and
    pq_topk refuses the mismatch."""
    import pytest

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where("vec_id < 2").withColumnRenamed("vec_id", "query_id")
    m1 = S.pq_fit(emb, n_cells=4, m_sub=8, ksub=16, seed=7)
    m2 = S.pq_fit(emb, n_cells=4, m_sub=8, ksub=16, seed=8)
    assert m1["model_id"] != m2["model_id"]
    path = str(tmp_path / "pqidx")
    S.pq_index(emb, m1).write.parquet(path)
    idx = spark.read.parquet(path)
    with pytest.raises(ValueError, match="different pq model"):
        S.pq_topk(idx, q, m2, emb, k=3)
    # the matching model still works through the parquet round trip
    assert S.pq_topk(idx, q, m1, emb, k=3).count() > 0
    with pytest.raises(ValueError, match="rerank path"):
        S.quantized_topk_oracle(rerank_factor=1)


def test_pq_index_appends_incrementally(spark, sf_dir, tmp_path):
    """Daily-ingest shape: a new batch is encoded under the SAME model
    and appended to the index parquet — the corpus is never
    re-encoded, the model fingerprint survives the mixed-file read,
    and probes see the appended vectors."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = emb.where("vec_id < 400")
    batch = emb.where("vec_id >= 400")
    model = S.pq_fit(old, n_cells=8, m_sub=8, ksub=64)
    path = str(tmp_path / "pqidx")
    S.pq_index(old, model).write.parquet(path)
    S.pq_index(batch, model).write.mode("append").parquet(path)
    idx = spark.read.parquet(path)
    assert idx.count() == emb.count()
    # full-corpus parity: appending batch encodings == encoding the
    # union in one pass (row-local, model-determined)
    a = sorted((r["vec_id"], r["cell"], tuple(r["codes"]))
               for r in idx.collect())
    b = sorted((r["vec_id"], r["cell"], tuple(r["codes"]))
               for r in S.pq_index(emb, model).collect())
    assert a == b
    # a probe over the combined index can return appended neighbors
    q = emb.where("vec_id in (5, 17)").withColumnRenamed(
        "vec_id", "query_id"
    )
    got = S.pq_topk(idx, q, model, emb, k=10, rerank_factor=8).collect()
    assert {r["query_id"] for r in got} == {5, 17}
    assert any(r["neighbor_id"] >= 400 for r in got)


def test_pq_probed_mode_on_clustered_corpus(spark, sf_dir):
    """IVF mode (n_probe cells per query) is for CLUSTERED corpora:
    on a label-shifted variant of the testdata (same derivation as
    tools/scalecheck.py's pq_ivf_clustered rows) the probed scan
    touches a bounded corpus fraction and still recovers the exact
    top-k."""
    import numpy as np

    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = src.orderBy("vec_id").collect()
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    L = np.array([r["label"] for r in rows])
    Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    D = np.random.RandomState(3).randn(10, 64)
    D /= np.linalg.norm(D, axis=1, keepdims=True)
    Vc = Vn + 1.0 * D[L]
    emb = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in v]) for r, v in zip(rows, Vc)],
        "vec_id bigint, embedding array<double>",
    )
    q = emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id")
    model = S.pq_fit(emb, n_cells=16, m_sub=8, ksub=256)
    idx = S.pq_index(emb, model).persist()
    try:
        # probed candidates touch <= ~probe/cells of the corpus
        # (cells are balanced on clustered data)
        probed = S.pq_topk(
            idx, q, model, emb, k=10, n_probe=4, rerank_factor=8
        ).collect()
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in S.brute_force_topk(emb, q, k=10).collect()}
        got = {(r["query_id"], r["neighbor_id"]) for r in probed}
        assert len(got & exact) / len(exact) >= 0.85
    finally:
        idx.unpersist()


# ------------------------------------------------- tokenizer training


def test_vocab_counts_matches_duckdb(spark, sf_dir):
    """Cross-engine parity for the vocabulary table, incl. the
    min_count/top_k knobs (deterministic tiebreak on token)."""
    import duckdb

    from etl_workflow_spark.operators.text import (
        vocab_counts,
        vocab_counts_oracle,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    for kwargs in ({}, {"min_count": 3}, {"top_k": 50, "min_count": 2}):
        got = [
            (r["token"], r["count"])
            for r in vocab_counts(docs, **kwargs).collect()
        ]
        want = con.execute(vocab_counts_oracle(**kwargs)).fetchall()
        if "top_k" in kwargs:
            assert got == want  # ordered take: exact sequence parity
        else:
            assert sorted(got) == sorted(want)
    con.close()


def test_bpe_pair_counts_python_oracle(spark):
    from collections import Counter

    from etl_workflow_spark.operators.text import bpe_pair_counts

    vocab = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
             ("a", 7)]
    want = Counter()
    for w, c in vocab:
        for a, b in zip(w, w[1:]):
            want[(a, b)] += c
    df = spark.createDataFrame(vocab, "token string, count long")
    got = {(r["left"], r["right"]): r["pair_count"]
           for r in bpe_pair_counts(df).collect()}
    assert got == dict(want)
    # top_k returns the best merges first, ties broken lexically
    top = bpe_pair_counts(df, top_k=2).collect()
    best = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [((r["left"], r["right"]), r["pair_count"]) for r in top] == best


# --------------------------------------------------------- BPE tokenizer


def _naive_bpe(words, num_merges, min_pair_count=2):
    """Recount-everything-per-iteration oracle for learn_bpe's
    incremental pair-count maintenance."""
    seqs = {w: list(w) for w, _ in words}
    counts = dict(words)
    merges = []
    for _ in range(num_merges):
        stats = {}
        for w, seq in seqs.items():
            for p in zip(seq, seq[1:]):
                stats[p] = stats.get(p, 0) + counts[w]
        if not stats:
            break
        pair = min(stats, key=lambda p: (-stats[p], p))
        if stats[pair] < min_pair_count:
            break
        merges.append(pair)
        for w in seqs:
            seqs[w] = T._merge_word(seqs[w], pair, pair[0] + pair[1])
    return merges, seqs


def test_learn_bpe_matches_naive_oracle():
    words = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
             ("wider", 1), ("new", 2), ("aaa", 4)]
    model = T.learn_bpe(words, num_merges=12)
    want, want_seqs = _naive_bpe(words, 12)
    assert [tuple(m) for m in model["merges"]] == want
    # encoding each training word reproduces its final training
    # segmentation (min-rank replay == in-order replay)
    ranks = {tuple(m): r for r, m in enumerate(model["merges"])}
    for w, _ in words:
        assert T.bpe_segment_word(w, ranks) == want_seqs[w]
    # 'aaa' merges left-to-right non-overlapping: ['aa', 'a']
    assert "".join(T.bpe_segment_word("aaa", ranks)) == "aaa"


def test_learn_bpe_incremental_equals_naive_on_random_corpora():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.text(alphabet="abcd", min_size=1, max_size=8),
                st.integers(min_value=1, max_value=9),
            ),
            min_size=1,
            max_size=12,
            unique_by=lambda wc: wc[0],
        )
    )
    def check(words):
        model = T.learn_bpe(words, num_merges=8, min_pair_count=1)
        want, _ = _naive_bpe(words, 8, min_pair_count=1)
        assert [tuple(m) for m in model["merges"]] == want

    check()


def test_train_bpe_first_merge_is_top_pair(spark):
    df = _docs(spark, [(1, "low lower low low"), (2, "newest new lowest")])
    model = T.train_bpe(df, num_merges=5)
    top = T.bpe_pair_counts(T.vocab_counts(df)).first()
    assert model["merges"][0] == [top["left"], top["right"]]
    # stop rule: every learned merge had count >= 2 at selection time
    assert len(model["merges"]) <= 5


def test_bpe_encode_strings_ids_and_nulls(spark):
    import json

    df = _docs(spark, [(1, "low low lower"), (2, None), (3, "   "),
                       (4, "LOW"), (5, "xyz")])
    model = T.train_bpe(df.where("doc_id = 1"), num_merges=3,
                        min_pair_count=1)
    # model survives a JSON round-trip (the persistence contract)
    model = json.loads(json.dumps(model))
    rows = {r["doc_id"]: r["bpe_tokens"]
            for r in T.bpe_encode(df, model).collect()}
    assert rows[2] is None          # NULL text stays NULL
    assert rows[3] == []            # whitespace-only -> empty
    assert rows[4] == rows[1][:len(rows[4])]  # lowercase recorded
    for did in (1, 4, 5):
        assert "".join(rows[did]) == " ".join(
            df.where(f"doc_id = {did}").first()["text"].lower().split()
        ).replace(" ", "")
    ids = {r["doc_id"]: r["bpe_tokens"]
           for r in T.bpe_encode(df, model, ids=True).collect()}
    sym = {s: i for i, s in enumerate(model["symbols"])}
    assert ids[1] == [sym[s] for s in rows[1]]
    oov = len(model["symbols"])
    assert ids[5] != [] and all(
        i == oov for i, s in zip(ids[5], rows[5]) if s not in sym
    )
    # doc 5's chars never occur in training -> every id is OOV
    assert set(ids[5]) == {oov}


def test_bpe_encode_tokenizes_like_training(spark):
    """Non-ASCII whitespace (NBSP) is NOT a word boundary for Spark's
    tokens() (Java \\s+ is ASCII-only) — encode must agree, or symbols
    learned across NBSP become unreachable."""
    t = "foo bar foo bar baz"
    df = _docs(spark, [(1, t)])
    model = T.train_bpe(df, num_merges=20, min_pair_count=1)
    assert "foo bar" in model["symbols"]  # learned as ONE word
    toks = T.bpe_encode(df, model).first()["bpe_tokens"]
    assert toks == ["foo bar", "foo bar", "baz"]


def test_bpe_symbol_table_is_a_bijection():
    """ADVICE r8: colliding merge pairs ((a,bc) and (ab,c) both yield
    'abc') must not produce duplicate symbol strings — duplicates
    shadow the earlier {symbol: index} entry and overcount the OOV id.
    Unreachable in 50k randomized learn_bpe corpora, so the guard is
    tested directly at the symbol-table builder."""
    from etl_workflow_spark.operators.text import _dedup_symbols

    syms = _dedup_symbols(
        ["a", "b", "c"], [("a", "b"), ("b", "c"), ("a", "bc"), ("ab", "c")]
    )
    assert syms == ["a", "b", "c", "ab", "bc", "abc"]
    assert len(syms) == len(set(syms))
    # learn_bpe wires the guard in: whatever the merges, the model's
    # symbol table is duplicate-free
    m = T.learn_bpe([("abab", 9), ("ab", 5)], num_merges=5, min_pair_count=1)
    assert len(m["symbols"]) == len(set(m["symbols"]))


def test_byte_fallback_bpe_spark_round_trip(spark, sf_dir):
    """bpe_encode → bpe_decode on a byte_fallback model is the exact
    identity over real testdata documents plus crafted docs with
    unseen scripts / NBSP / emoji (lowercase=False); ids and symbol
    modes agree; NULL stays NULL and empty stays empty."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(20)
    )
    crafted = spark.createDataFrame(
        [(9001, "Ünïcode   nbsp and 日本語 🎉 mixed"),
         (9002, None),
         (9003, ""),
         (9004, "  leading and trailing  ")],
        "doc_id long, text string",
    )
    df = docs.unionByName(crafted)
    model = T.train_bpe(
        df, num_merges=50, lowercase=False, byte_fallback=True,
        min_pair_count=1,
    )
    enc = T.bpe_encode(df, model)
    out = {r["doc_id"]: r for r in T.bpe_decode(
        enc, model, col="bpe_tokens"
    ).collect()}
    for did, r in out.items():
        assert r["text_decoded"] == r["text"], did
    assert out[9002]["text_decoded"] is None
    assert out[9003]["text_decoded"] == ""
    # ids mode round-trips identically
    enc_ids = T.bpe_encode(crafted, model, ids=True)
    got = {r["doc_id"]: r["text_decoded"] for r in T.bpe_decode(
        enc_ids, model, ids=True
    ).collect()}
    assert got[9001] == "Ünïcode   nbsp and 日本語 🎉 mixed"
    assert got[9004] == "  leading and trailing  "


def test_byte_fallback_bpe_edge_inputs():
    """Review hardening: (a) a LEARNED symbol colliding with a
    reserved <0xNN> piece byte-expands at encode time, so literal
    '<0x41>' text round-trips instead of decoding to 'A'; (b) lone
    surrogates encode via surrogatepass and round-trip instead of
    crashing the Arrow batch; (c) NULL elements inside a token array
    decode to U+FFFD instead of raising."""
    from etl_workflow_spark.operators.text import (
        _make_bpe_encoder, decode_bpe_tokens, learn_bpe,
    )

    # learn '<0x41>' as a real symbol from a hexdump-ish corpus
    model = learn_bpe(
        [("<0x41>", 50), ("x41", 5)], num_merges=10, lowercase=False,
        min_pair_count=1, byte_fallback=True,
    )
    assert "<0x41>" in model["symbols"]
    for text in ("<0x41> A", "A <0x41> <0x42>"):
        toks = _make_bpe_encoder(model)(text)
        assert decode_bpe_tokens(toks, model) == text
        ids = _make_bpe_encoder(model, ids=True)(text)
        assert decode_bpe_tokens(ids, model, ids=True) == text
    # lone surrogate: no UnicodeEncodeError, exact round-trip
    weird = "\ud800x \udfffy"
    toks = _make_bpe_encoder(model)(weird)
    assert decode_bpe_tokens(toks, model) == weird
    # NULL elements inside an array decode to U+FFFD, never raise
    assert decode_bpe_tokens(["x", None, "y"], model) == "x�y"
    assert "�" in decode_bpe_tokens([0, None], model, ids=True)


def test_learn_bpe_folds_case_when_lowercasing(spark):
    model = T.learn_bpe([("Low", 5), ("LOW", 3), ("lower", 1)],
                        num_merges=3, min_pair_count=1)
    # counts folded: 'lo'/'low' merges learned from 9 combined copies
    assert model["merges"][0] == ["l", "o"]
    assert all(s == s.lower() for s in model["symbols"])
    df = _docs(spark, [(1, "LOW Low low")])
    rows = T.bpe_encode(df, model).first()["bpe_tokens"]
    assert rows == ["low", "low", "low"]


# ------------------------------------------------- unigram tokenizer


def test_viterbi_matches_bruteforce_oracle():
    """Viterbi DP == exhaustive best-segmentation enumeration (the
    independent oracle) for every word over a small random model."""
    import itertools
    import random

    from etl_workflow_spark.operators.text import _viterbi_segment

    rnd = random.Random(5)
    pieces = ["a", "b", "c", "ab", "bc", "abc", "cab", "bb"]
    logp = {p: -rnd.uniform(0.5, 6.0) for p in pieces}
    unk = min(logp.values()) - 10.0

    def brute(word):
        best, best_score = None, float("-inf")
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=max(0, n - 1)):
            segs, start = [], 0
            for i, cut in enumerate(cuts, 1):
                if cut:
                    segs.append(word[start:i])
                    start = i
            segs.append(word[start:])
            try:
                score = sum(
                    logp[s] if s in logp
                    else (unk if len(s) == 1 else float("-inf"))
                    for s in segs
                )
            except KeyError:
                continue
            if score > best_score:
                best, best_score = segs, score
        return best, best_score

    for _ in range(300):
        w = "".join(rnd.choice("abcx") for _ in range(rnd.randint(1, 7)))
        got = _viterbi_segment(w, logp, 8, unk)
        _, want_score = brute(w)
        got_score = sum(logp.get(s, unk) for s in got)
        assert "".join(got) == w
        assert abs(got_score - want_score) < 1e-9, (w, got)


def test_learn_unigram_model_contracts():
    import math

    from etl_workflow_spark.operators.text import learn_unigram

    words = [("hello", 30), ("help", 20), ("world", 25), ("word", 10),
             ("low", 5), ("lowest", 3)]
    m = learn_unigram(words, vocab_size=15, lowercase=False)
    # normalized distribution, deterministic rerun
    assert abs(sum(math.exp(lp / 1e6) for lp in m["logprobs_e6"]) - 1) < 1e-3
    assert m == learn_unigram(words, vocab_size=15, lowercase=False)
    # every training character survives pruning; vocab bound respected
    chars = {ch for w, _ in words for ch in w}
    assert chars <= set(m["pieces"])
    assert sum(1 for p in m["pieces"] if len(p) > 1) <= 15 - len(chars)
    # case folding mirrors vocab_counts
    ml = learn_unigram([("Low", 5), ("LOW", 3)], vocab_size=8)
    assert all(p == p.lower() for p in ml["pieces"])
    # empty table -> empty model
    assert learn_unigram([], vocab_size=4)["pieces"] == []


def test_unigram_encode_and_logprob_spark(spark, sf_dir):
    """Spark encode == the driver-side Viterbi the model was trained
    with; ids reserve len(pieces) for unknown chars; unigram_logprob
    equals the hand-computed mean piece log-prob."""
    import math

    from etl_workflow_spark.operators.text import (
        _make_unigram_segmenter, _unigram_tables, train_unigram,
        unigram_encode, unigram_logprob,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(30)
    )
    crafted = spark.createDataFrame(
        [(9001, "héllo wörld ñ"), (9002, None), (9003, "  ")],
        "doc_id long, text string",
    )
    df = docs.unionByName(crafted)
    model = train_unigram(df, vocab_size=200)
    logp, unk, sym_ids, oov, lowercase, max_len, _fb = _unigram_tables(model)
    # the factory IS the UDF's code path, so parity here covers the
    # whitespace contract too
    one_doc = _make_unigram_segmenter(model)
    rows = {r["doc_id"]: r for r in unigram_encode(df, model).collect()}
    for r in df.collect():
        did, text = r["doc_id"], r["text"]
        assert rows[did]["unigram_tokens"] == one_doc(text), did
    ids_rows = {r["doc_id"]: r["unigram_tokens"]
                for r in unigram_encode(df, model, ids=True).collect()}
    assert all(0 <= i <= oov for i in ids_rows[9001])
    scores = {r["doc_id"]: r for r in unigram_logprob(df, model).collect()}
    assert scores[9002]["n_pieces"] is None
    assert scores[9003]["n_pieces"] == 0
    assert scores[9003]["avg_logprob_e6"] is None
    did = next(d for d in rows if rows[d]["unigram_tokens"])
    segs = rows[did]["unigram_tokens"]
    want_avg = sum(logp.get(s, unk) for s in segs) / len(segs)
    assert scores[did]["n_pieces"] == len(segs)
    assert scores[did]["avg_logprob_e6"] == int(math.floor(want_avg * 1e6))
    # fluency signal: real text scores above a gibberish doc
    gib = spark.createDataFrame(
        [(9100, "zq xv qqj wvx zzqx vq")], "doc_id long, text string"
    )
    gib_score = unigram_logprob(gib, model).collect()[0]["avg_logprob_e6"]
    assert gib_score < scores[did]["avg_logprob_e6"]
    # corrupt models fail loudly, not with silent whole-word tokens
    bad = dict(model, max_piece_len=0)
    with pytest.raises(ValueError, match="max_piece_len"):
        _unigram_tables(bad)


def test_unigram_subword_regularization_sampling(spark):
    """Kudo 2018 sampling mode: draws ∝ P(seg)^alpha — diverse at low
    alpha, Viterbi-convergent at high alpha, always concatenating to
    the word, and a pure function of (seed, word) so the Spark pass is
    replay-safe and layout-invariant."""
    from etl_workflow_spark.operators.text import (
        _make_unigram_segmenter, learn_unigram, unigram_encode,
    )

    model = learn_unigram(
        [("abc", 10), ("ab", 8), ("bc", 8), ("a", 5), ("b", 5), ("c", 5)],
        vocab_size=10, lowercase=False,
    )
    segs = set()
    for seed in range(30):
        f = _make_unigram_segmenter(model, sample_alpha=0.2, seed=seed)
        got = f("abc abc")
        assert "".join(got) == "abcabc"
        segs.add(tuple(got))
    assert len(segs) >= 3  # genuinely samples the segmentation lattice
    # per-OCCURRENCE draws (the paper's recipe): under ONE seed,
    # repeated occurrences of a word inside one doc draw independent
    # segmentations — the flat output is NOT just the first
    # occurrence's split repeated
    diverse = False
    for seed in range(8):
        f = _make_unigram_segmenter(model, sample_alpha=0.2, seed=seed)
        flat = f("abc " * 12)
        first = f("abc")
        if flat != first * 12:
            diverse = True
            break
    assert diverse
    # sampling without an explicit seed is refused (the silent
    # fixed-stream footgun)
    with pytest.raises(ValueError, match="explicit seed"):
        _make_unigram_segmenter(model, sample_alpha=0.2)
    # high alpha -> the argmax segmentation
    viterbi = _make_unigram_segmenter(model)
    sharp = _make_unigram_segmenter(model, sample_alpha=100.0, seed=3)
    for w in ("abc", "abcabc", "bca"):
        assert sharp(w) == viterbi(w)
    # determinism: same (seed, word) across independent instances
    a = _make_unigram_segmenter(model, sample_alpha=0.2, seed=7)("abc")
    b = _make_unigram_segmenter(model, sample_alpha=0.2, seed=7)("abc")
    assert a == b
    # Spark pass == the factory (same code path, same seeds)
    df = spark.createDataFrame(
        [(1, "abc bc abc"), (2, None)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["unigram_tokens"] for r in unigram_encode(
        df, model, sample_alpha=0.2, seed=7
    ).collect()}
    want = _make_unigram_segmenter(model, sample_alpha=0.2, seed=7)
    assert rows[1] == want("abc bc abc")
    assert rows[2] is None


def test_byte_fallback_unigram_spark_round_trip(spark, sf_dir):
    """unigram_encode → unigram_decode on a byte_fallback model is the
    exact identity over real testdata documents plus crafted docs with
    unseen scripts / NBSP / emoji (lowercase=False); ids and symbol
    modes agree; NULL stays NULL and empty stays empty — the BPE twin,
    closing the lossy reserved-OOV path of the plain unigram model."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").limit(20)
    )
    crafted = spark.createDataFrame(
        [(9001, "Ünïcode   nbsp and 日本語 🎉 mixed"),
         (9002, None),
         (9003, ""),
         (9004, "  leading and trailing  ")],
        "doc_id long, text string",
    )
    df = docs.unionByName(crafted)
    model = T.train_unigram(
        df, vocab_size=200, lowercase=False, byte_fallback=True,
    )
    enc = T.unigram_encode(df, model)
    out = {r["doc_id"]: r for r in T.unigram_decode(
        enc, model, col="unigram_tokens"
    ).collect()}
    for did, r in out.items():
        assert r["text_decoded"] == r["text"], did
    assert out[9002]["text_decoded"] is None
    assert out[9003]["text_decoded"] == ""
    enc_ids = T.unigram_encode(crafted, model, ids=True)
    got = {r["doc_id"]: r["text_decoded"] for r in T.unigram_decode(
        enc_ids, model, ids=True
    ).collect()}
    assert got[9001] == "Ünïcode   nbsp and 日本語 🎉 mixed"
    assert got[9004] == "  leading and trailing  "


def test_byte_fallback_unigram_edge_inputs():
    """(a) a LEARNED piece colliding with a reserved <0xNN> is never
    produced by segmentation (excluded from the Viterbi table), so
    literal '<0x41>' text round-trips instead of decoding to 'A';
    (b) lone surrogates round-trip via surrogatepass; (c) NULL
    elements inside a token array decode to U+FFFD; (d) the plain
    (non-fallback) model is unchanged: unknown chars still map to the
    reserved unknown id and decode lossily."""
    from etl_workflow_spark.operators.text import (
        _make_unigram_segmenter, decode_unigram_tokens, learn_unigram,
    )

    model = learn_unigram(
        [("<0x41>", 50), ("x41", 5)], vocab_size=30, lowercase=False,
        max_piece_len=8, byte_fallback=True,
    )
    assert "<0x41>" in model["pieces"]
    assert len(model["pieces"]) == len(model["logprobs_e6"])
    for text in ("<0x41> A", "A <0x41> <0x42>"):
        toks = _make_unigram_segmenter(model)(text)
        assert decode_unigram_tokens(toks, model) == text
        ids = _make_unigram_segmenter(model, ids=True)(text)
        assert decode_unigram_tokens(ids, model, ids=True) == text
    weird = "\ud800x \udfffy"
    toks = _make_unigram_segmenter(model)(weird)
    assert decode_unigram_tokens(toks, model) == weird
    assert decode_unigram_tokens(["x", None, "y"], model) == "x�y"
    assert "�" in decode_unigram_tokens([0, None], model, ids=True)
    # plain model: documented lossy path intact
    plain = learn_unigram([("ab", 5)], vocab_size=8, lowercase=False)
    ids = _make_unigram_segmenter(plain, ids=True)("aZ")
    assert len(plain["pieces"]) in ids  # reserved unknown id emitted


def test_unigram_sampling_doc_key_decorrelates_documents(spark):
    """ADVICE r9: with a doc key mixed into the crc32 seed, the k-th
    occurrence of a word draws INDEPENDENT segmentations across
    documents (Kudo resamples per sentence); draws stay deterministic
    per (seed, word, occ, key), and the Spark pass with doc_id_col
    matches the factory."""
    from etl_workflow_spark.operators.text import (
        _make_unigram_segmenter, learn_unigram, unigram_encode,
    )

    model = learn_unigram(
        [("abc", 10), ("ab", 8), ("bc", 8), ("a", 5), ("b", 5), ("c", 5)],
        vocab_size=10, lowercase=False,
    )
    f = _make_unigram_segmenter(model, sample_alpha=0.2, seed=11)
    # same text, different doc keys -> at least one differing draw
    # across a pool of keys (each word occurrence resampled per doc)
    text = "abc " * 8
    base = f(text, "doc-0")
    assert any(f(text, f"doc-{k}") != base for k in range(1, 40))
    # deterministic: same key reproduces the same draw across
    # independent segmenter instances
    g = _make_unigram_segmenter(model, sample_alpha=0.2, seed=11)
    assert g(text, "doc-7") == f(text, "doc-7")
    # no key falls back to the per-(word, occ) draw (documented)
    assert g(text) == f(text)
    # Spark pass with doc_id_col == factory with the same keys
    df = spark.createDataFrame(
        [(1, "abc bc abc"), (2, "abc bc abc"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["unigram_tokens"] for r in unigram_encode(
        df, model, sample_alpha=0.2, seed=11, doc_id_col="doc_id"
    ).collect()}
    assert rows[1] == f("abc bc abc", 1)
    assert rows[2] == f("abc bc abc", 2)
    assert rows[3] is None


def _aniso_corpus(spark, n=1200, dim=32, seed=11):
    """Anisotropic + correlated embeddings — the shape real encoders
    emit and the one contiguous PQ dim-slices handle worst: a latent
    gaussian pushed through a decaying-spectrum mixer, so energy
    concentrates in a few NON-axis-aligned directions."""
    import numpy as np

    rng = np.random.RandomState(seed)
    U, _ = np.linalg.qr(rng.randn(dim, dim))
    V, _ = np.linalg.qr(rng.randn(dim, dim))
    A = U @ np.diag(np.exp(-np.arange(dim) / 4.0)) @ V
    X = rng.randn(n, dim) @ A
    return spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )


def test_opq_rotation_lifts_adc_recall_on_anisotropic_data(spark):
    """OPQ (Ge et al. 2013): the learned rotation is orthogonal to
    machine precision, survives a JSON round trip, changes the model
    fingerprint (a rotation-less index is refused), leaves the exact
    re-rank scores bit-identical to brute force, and lifts RAW ADC
    recall (rerank_factor=1 — no exact re-rank masking the
    quantization error) over plain PQ on an anisotropic corpus.
    Measured on this fixture: 0.519 -> 0.625."""
    import json as _json

    import numpy as np

    emb = _aniso_corpus(spark).persist()
    emb.count()
    q = emb.where("vec_id < 16").withColumnRenamed("vec_id", "query_id")
    truth = {}
    brute = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
             for r in S.brute_force_topk(emb, q, k=10).collect()}
    for qid, nid in brute:
        truth.setdefault(qid, set()).add(nid)

    def recall(model):
        idx = S.pq_index(emb, model)
        got = {}
        for r in S.pq_topk(idx, q, model, emb, k=10,
                           rerank_factor=1).collect():
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return sum(
            len(got.get(k, set()) & v) for k, v in truth.items()
        ) / sum(len(v) for v in truth.values())

    plain = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=16, seed=7)
    opq = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=16, seed=7, opq_iters=5)
    # model contract: orthogonal rotation, JSON-stable, distinct id
    R = np.asarray(opq["rotation"])
    assert np.abs(R @ R.T - np.eye(R.shape[0])).max() < 1e-9
    assert _json.loads(_json.dumps(opq)) == opq
    assert opq["model_id"] != plain["model_id"]
    assert "rotation" not in plain  # rotation-less models unchanged
    r_plain, r_opq = recall(plain), recall(opq)
    assert r_opq > r_plain + 0.05, (r_plain, r_opq)
    # cross-model index refusal: codes encoded without the rotation
    # must never be scored under it (and vice versa)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different pq model"):
        S.pq_topk(S.pq_index(emb, plain), q, opq, emb, k=5)
    with _pytest.raises(ValueError, match="different pq model"):
        S.pq_topk(S.pq_index(emb, opq), q, plain, emb, k=5)
    # exact re-rank parity holds under the rotation (orthogonal ->
    # same cosine): every returned overlapping pair scores identically
    for r in S.pq_topk(
        S.pq_index(emb, opq), q, opq, emb, k=10, rerank_factor=8
    ).collect():
        key = (r["query_id"], r["neighbor_id"])
        if key in brute:
            assert r["score_e4"] == brute[key]
    emb.unpersist()


def test_pq_index_multi_batch_encode_consistent(spark):
    """Code-review regression (r10): encode() must treat every Arrow
    batch identically — a prior bug clobbered the OPQ rotation
    variable with the first batch's residual matrix, corrupting or
    crashing partitions with more than one batch. Encode with a tiny
    Arrow batch size and compare against the one-batch result, plain
    and rotated models."""
    emb = _aniso_corpus(spark, n=300, dim=16, seed=4).coalesce(1)
    for iters in (0, 3):
        model = S.pq_fit(emb, n_cells=4, m_sub=4, ksub=8,
                         seed=7, opq_iters=iters)
        big = {r["vec_id"]: (r["cell"], tuple(r["codes"]))
               for r in S.pq_index(emb, model).collect()}
        old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "37")
        try:
            small = {r["vec_id"]: (r["cell"], tuple(r["codes"]))
                     for r in S.pq_index(emb, model).collect()}
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.maxRecordsPerBatch", old
            )
        assert small == big and len(big) == 300


def test_unigram_logprob_scores_fallback_like_plain(spark):
    """Code-review regression (r10): unigram_logprob on a
    byte_fallback model must score the PLAIN segmentation — not charge
    the unk floor for every whitespace/unknown byte token the fallback
    encoder emits."""
    from etl_workflow_spark.operators.text import (
        learn_unigram, unigram_logprob,
    )

    words = [("hello", 20), ("world", 15), ("data", 9)]
    plain = learn_unigram(words, vocab_size=30, lowercase=False)
    fb = learn_unigram(
        words, vocab_size=30, lowercase=False, byte_fallback=True,
    )
    df = spark.createDataFrame(
        [(1, "hello world hello"), (2, "data Ünseen"), (3, None)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: (r["n_pieces"], r["avg_logprob_e6"])
         for r in unigram_logprob(df, plain).collect()}
    b = {r["doc_id"]: (r["n_pieces"], r["avg_logprob_e6"])
         for r in unigram_logprob(df, fb).collect()}
    assert a == b


def test_imi_index_and_topk_contract(spark, sf_dir):
    """Inverted multi-index (Babenko & Lempitsky 2012): product cells
    from two half-space quantizers; probing pairs in ascending summed
    half-distance order recovers ≥0.85 of the exact top-10 at ~11% of
    rows on a realistic (anisotropic) corpus — measured 0.919 at
    0.114 on this fixture (K=16, T=16) — with exact per-pair scores;
    stale/odd-dim/empty inputs are refused. The isotropic testdata's
    comparison against flat IVF lives in scalecheck's imi rows."""
    emb = _aniso_corpus(spark, n=1200, dim=32, seed=11).persist()
    emb.count()
    q = emb.where("vec_id < 16").withColumnRenamed("vec_id", "query_id")
    model = S.imi_fit(emb, n_cells=16)
    assert model["n_cells"] == 16 and model["half"] == 16
    idx = S.imi_index(emb, model)
    assert dict(idx.dtypes) == {
        "vec_id": "bigint", "cell_a": "int", "cell_b": "int"
    }
    exact = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
             for r in S.brute_force_topk(emb, q, k=10).collect()}
    got_rows = S.imi_topk(
        idx, q, model, emb, k=10, n_probe_pairs=16
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    assert len(got & set(exact)) / len(exact) >= 0.85
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["score_e4"] == exact[key]
    # stale-index refusal across models
    other = S.imi_fit(emb, n_cells=8)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="different imi model"):
        S.imi_topk(idx, q, other, emb, k=5)
    with _pytest.raises(ValueError, match="even dim"):
        S.imi_fit(
            emb.selectExpr("vec_id", "slice(embedding, 1, 31) as embedding")
        )
    with _pytest.raises(ValueError, match="non-empty"):
        S.imi_fit(emb.where("vec_id < 0"))
    # sanity bound (r11: the heap path lifted the 256 grid limit; the
    # remaining bound is codebook-training degeneracy): oversized
    # n_cells refuses loudly at fit AND at the model check (a
    # hand-built model cannot dodge it)
    with _pytest.raises(ValueError, match="supported bound"):
        S.imi_fit(emb, n_cells=5000)
    big = dict(model, n_cells=8192)
    with _pytest.raises(ValueError, match="supported bound"):
        S.imi_topk(idx, q, big, emb, k=5)
    emb.unpersist()


def test_imi_rank_pairs_heap_matches_grid():
    """The multi-sequence traversal (Babenko & Lempitsky 2012 §3.1)
    returns EXACTLY the grid ranking, row-for-row — random inputs,
    asymmetric halves, deliberate bit-equal ties at the truncation
    boundary, and the full/over-asked edge."""
    import numpy as np

    from etl_workflow_spark.operators.similarity import _imi_rank_pairs

    rng = np.random.RandomState(7)
    for trial in range(30):
        n_a = int(rng.randint(1, 40))
        n_b = int(rng.randint(1, 40))
        qa = rng.rand(n_a)
        qb = rng.rand(n_b)
        if trial % 3 == 0:
            # force sum ties: quantize distances so many pairs share
            # bit-identical sums (0.25 increments add exactly)
            qa = np.round(qa * 4) / 4.0
            qb = np.round(qb * 4) / 4.0
        for t in (1, 3, n_a * n_b // 2 or 1, n_a * n_b, n_a * n_b + 5):
            grid = _imi_rank_pairs(qa, qb, t)
            heap = _imi_rank_pairs(qa, qb, t, force_heap=True)
            assert heap == grid, (trial, n_a, n_b, t)
    assert _imi_rank_pairs(np.array([1.0]), np.array([2.0]), 0) == []


def test_imi_heap_path_end_to_end(spark):
    """n_cells past the grid bound runs through the heap prober in
    the real distributed query: same recall contract as the grid
    tier, exact per-pair scores, and the candidate fraction shrinks
    with the finer product grid."""
    emb = _aniso_corpus(spark, n=1500, dim=32, seed=13).persist()
    emb.count()
    q = emb.where("vec_id < 8").withColumnRenamed("vec_id", "query_id")
    model = S.imi_fit(emb, n_cells=300)  # 90k product cells, heap path
    assert model["n_cells"] == 300
    idx = S.imi_index(emb, model)
    exact = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
             for r in S.brute_force_topk(emb, q, k=10).collect()}
    got_rows = S.imi_topk(
        idx, q, model, emb, k=10, n_probe_pairs=600
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    assert len(got & set(exact)) / len(exact) >= 0.85
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["score_e4"] == exact[key]
    emb.unpersist()


def test_bpe_dropout_regularization(spark):
    """BPE-dropout (Provilkov et al. 2020), the BPE twin of unigram
    subword-regularization: p=0 reproduces deterministic segmentation
    exactly; p>0 samples genuinely varied segmentations that always
    concatenate back to the word; draws are deterministic per (seed,
    word, occ, doc key) and decorrelate across docs/seeds; the seed is
    required; the Spark pass with doc_id_col matches the factory."""
    from etl_workflow_spark.operators.text import (
        _make_bpe_encoder, learn_bpe,
    )

    model = learn_bpe(
        [("abcd", 12), ("abc", 10), ("ab", 8), ("cd", 8), ("bc", 6)],
        num_merges=20, lowercase=False, min_pair_count=1,
    )
    det = _make_bpe_encoder(model)
    zero = _make_bpe_encoder(model, dropout=0.0, seed=1)
    for w in ("abcd", "abcabc", "dcba", "abcdabcd xyz"):
        assert zero(w) == det(w)
    # p>0: varied segmentations, all concatenating to the input word
    segs = set()
    f = _make_bpe_encoder(model, dropout=0.4, seed=3)
    for k in range(30):
        got = f("abcd", f"doc-{k}")
        assert "".join(got) == "abcd"
        segs.add(tuple(got))
    assert len(segs) >= 3
    # per-occurrence draws within one doc
    diverse = any(
        _make_bpe_encoder(model, dropout=0.4, seed=s)("abcd " * 12)
        != _make_bpe_encoder(model, dropout=0.4, seed=s)("abcd") * 12
        for s in range(8)
    )
    assert diverse
    # determinism per (seed, doc key); seed required
    a = _make_bpe_encoder(model, dropout=0.4, seed=7)("abcd abcd", "d1")
    b = _make_bpe_encoder(model, dropout=0.4, seed=7)("abcd abcd", "d1")
    assert a == b
    import pytest as _pytest

    with _pytest.raises(ValueError, match="explicit seed"):
        _make_bpe_encoder(model, dropout=0.4)
    # Spark pass with doc_id_col == the factory with the same keys
    df = spark.createDataFrame(
        [(1, "abcd abc"), (2, "abcd abc"), (3, None)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["bpe_tokens"] for r in T.bpe_encode(
        df, model, dropout=0.4, seed=7, doc_id_col="doc_id"
    ).collect()}
    f7 = _make_bpe_encoder(model, dropout=0.4, seed=7)
    assert rows[1] == f7("abcd abc", 1)
    assert rows[2] == f7("abcd abc", 2)
    assert rows[3] is None


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=120, deadline=None)
@given(st.text(max_size=60), st.integers(0, 3))
def test_bpe_dropout_byte_fallback_round_trips(s, seed):
    """Dropout varies the segmentation, never the decoded string: the
    byte-fallback round trip holds under BPE-dropout for arbitrary
    unicode input."""
    from etl_workflow_spark.operators.text import (
        _make_bpe_encoder, decode_bpe_tokens, learn_bpe,
    )

    model = learn_bpe(
        [("hello", 20), ("world", 15), ("byte", 9)],
        num_merges=20, lowercase=False, min_pair_count=1,
        byte_fallback=True,
    )
    f = _make_bpe_encoder(model, dropout=0.3, seed=seed)
    assert decode_bpe_tokens(f(s, "doc-9"), model) == s


def test_imi_pq_composed_tier(spark):
    """The composed fraction×bytes query shape: IMI product cells
    bound the candidate fraction, PQ codes (OPQ-rotated) rank them via
    ADC, exact re-rank returns brute-force scores per pair; recall
    tracks the pure-IMI tier at the same pair budget (the composition
    trades nothing but the re-rank cut); mismatched models on either
    axis are refused."""
    emb = _aniso_corpus(spark, n=1200, dim=32, seed=11).persist()
    emb.count()
    q = emb.where("vec_id < 16").withColumnRenamed("vec_id", "query_id")
    imi_m = S.imi_fit(emb, n_cells=16)
    pq_m = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=32, opq_iters=3)
    idx = S.imi_pq_index(emb, imi_m, pq_m).persist()
    idx.count()
    exact = {(r["query_id"], r["neighbor_id"]): r["score_e4"]
             for r in S.brute_force_topk(emb, q, k=10).collect()}
    got_rows = S.imi_pq_topk(
        idx, q, imi_m, pq_m, emb, k=10, n_probe_pairs=16,
        rerank_factor=8,
    ).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in got_rows}
    assert len(got & set(exact)) / len(exact) >= 0.8
    for r in got_rows:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact:
            assert r["score_e4"] == exact[key]
    # refusals on either axis
    other_imi = S.imi_fit(emb, n_cells=8)
    other_pq = S.pq_fit(emb, n_cells=8, m_sub=8, ksub=32)
    with pytest.raises(ValueError, match="different imi model"):
        S.imi_pq_topk(idx, q, other_imi, pq_m, emb, k=5)
    with pytest.raises(ValueError, match="different pq model"):
        S.imi_pq_topk(idx, q, imi_m, other_pq, emb, k=5)
    # the fused index agrees with the two single-model indexes
    a = {(r["vec_id"], r["cell_a"], r["cell_b"])
         for r in idx.select("vec_id", "cell_a", "cell_b").collect()}
    b = {(r["vec_id"], r["cell_a"], r["cell_b"])
         for r in S.imi_index(emb, imi_m).collect()}
    assert a == b
    c = {(r["vec_id"], r["cell"], tuple(r["codes"]))
         for r in idx.select("vec_id", "cell", "codes").collect()}
    d = {(r["vec_id"], r["cell"], tuple(r["codes"]))
         for r in S.pq_index(emb, pq_m).collect()}
    assert c == d
    idx.unpersist()
    emb.unpersist()


def _dsir_corpus(spark):
    """50 'prose' docs + 50 'code' docs with disjoint vocabularies."""
    import random

    rnd = random.Random(5)
    prose_v = ("the river valley carries morning fog across quiet "
               "meadows while herons wade near willow roots").split()
    code_v = ("def return yield lambda import class self args kwargs "
              "assert raise except finally global nonlocal").split()
    rows = []
    for i in range(50):
        rows.append((i, " ".join(rnd.choices(prose_v, k=30)), "prose"))
    for i in range(50, 100):
        rows.append((i, " ".join(rnd.choices(code_v, k=30)), "code"))
    return spark.createDataFrame(
        rows, "doc_id long, text string, kind string"
    )


def test_dsir_fit_score_select(spark):
    """DSIR (Xie et al. 2023): scores match a numpy oracle exactly
    (shared featurizer, fixed-point weights); target-like docs score
    higher; Gumbel-top-k selection is deterministic, layout-invariant,
    strongly target-biased, and never selects NULL text; model
    round-trips JSON; empty inputs refuse."""
    import json as _json

    from etl_workflow_spark.operators.text import (
        _dsir_doc_counts, dsir_fit, dsir_score, dsir_select,
    )

    df = _dsir_corpus(spark)
    target = df.where("kind = 'prose' and doc_id < 10").select("text")
    model = dsir_fit(df, target, n=2, buckets=512)
    assert _json.loads(_json.dumps(model)) == model

    scored = {r["doc_id"]: r["logw_e6"]
              for r in dsir_score(df, model).collect()}
    # oracle parity on every doc — the featurizer is RE-IMPLEMENTED
    # here (lowercase, ASCII-ws split, crc32 % buckets) so the test is
    # independent of _dsir_doc_counts, not just of the dot product
    import re as _re
    import zlib as _zlib

    def oracle_counts(text):
        words = [w for w in _re.split(r"\s+", text.lower(), flags=_re.ASCII)
                 if w]
        c: dict = {}
        for g in (1, 2):
            for i in range(len(words) - g + 1):
                b = _zlib.crc32(" ".join(words[i:i + g]).encode()) % 512
                c[b] = c.get(b, 0) + 1
        return c

    R = model["log_ratio_e6"]
    for r in df.collect():
        want = sum(k * R[b] for b, k in oracle_counts(r["text"]).items())
        assert scored[r["doc_id"]] == want, r["doc_id"]
        assert oracle_counts(r["text"]) == _dsir_doc_counts(
            r["text"], 2, 512
        )
    # the FIT itself matches a dense numpy oracle (r11: the partial
    # merge moved into Spark — groupBy-sum of sparse partials — so
    # prove the merged counts produce the exact same model), and is
    # partition-invariant
    import math as _math

    import numpy as _np

    def oracle_dist(frame):
        c = _np.zeros(512, dtype=_np.int64)
        for row in frame.collect():
            for b, k in oracle_counts(row["text"]).items():
                c[b] += k
        return c + 1.0
    p, q = oracle_dist(target), oracle_dist(df.select("text"))
    want_ratio = _np.log(p / p.sum()) - _np.log(q / q.sum())
    assert model["log_ratio_e6"] == [
        int(_math.floor(x * 1e6)) for x in want_ratio
    ]
    assert dsir_fit(
        df.repartition(13), target.repartition(7), n=2, buckets=512
    ) == model
    # prose scores dominate code scores
    prose = [scored[i] for i in range(50)]
    code = [scored[i] for i in range(50, 100)]
    assert min(prose) > max(code)

    withnull = df.unionByName(spark.createDataFrame(
        [(999, None, "prose")], "doc_id long, text string, kind string"
    ))
    sel = dsir_select(withnull, model, n_select=30, salt="s1")
    ids = {r["doc_id"] for r in sel.collect()}
    assert len(ids) == 30 and 999 not in ids
    # strongly target-biased: at this separation all 30 are prose
    assert all(i < 50 for i in ids)
    # deterministic + layout-invariant
    ids2 = {r["doc_id"] for r in dsir_select(
        withnull.repartition(13), model, n_select=30, salt="s1"
    ).collect()}
    assert ids2 == ids
    # a different salt re-rolls the resampling noise: among the 50
    # near-equal-weight prose docs, a top-30 Gumbel draw under two
    # salts differs (verified deterministic for these fixed salts)
    prose_only = df.where("kind = 'prose'")
    sa = {r["doc_id"] for r in dsir_select(
        prose_only, model, n_select=30, salt="s1").collect()}
    sb = {r["doc_id"] for r in dsir_select(
        prose_only, model, n_select=30, salt="s2").collect()}
    assert sa != sb
    # NULL text scores NULL
    assert {r["logw_e6"] for r in dsir_score(
        spark.createDataFrame([(1, None)], "doc_id long, text string"),
        model,
    ).collect()} == {None}
    # empty inputs refuse at fit — including texts yielding zero
    # grams (a distribution estimated from nothing would silently be
    # the uniform smoother)
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty target"):
        dsir_fit(df, empty.select("text"), buckets=64)
    with pytest.raises(ValueError, match="non-empty raw"):
        dsir_fit(empty, target, buckets=64)
    blank = spark.createDataFrame(
        [(1, "   \t  "), (2, "")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="no.*featurizable"):
        dsir_fit(df, blank.select("text"), buckets=64)
    with pytest.raises(ValueError, match="not a dsir_fit model"):
        dsir_score(df, {"format": "nope"})


def test_quality_classifier_fit_score(spark):
    """fastText-style linear quality classifier (Joulin et al. 2016):
    perfectly separates the two-domain fixture; the fixed-point dot
    product matches an independent featurizer re-implementation
    exactly; fit and score are deterministic and layout-invariant;
    NULL/gram-less/one-class/corrupt-model edges behave."""
    import json as _json
    import math as _math
    import re as _re
    import zlib as _zlib

    from etl_workflow_spark.operators.text import (
        quality_classifier_fit, quality_classifier_score,
    )

    df = _dsir_corpus(spark)
    pos = df.where("kind = 'prose'").select("text")
    neg = df.where("kind = 'code'").select("text")
    model = quality_classifier_fit(pos, neg, buckets=512)
    assert _json.loads(_json.dumps(model)) == model
    assert len(model["weights_e6"]) == 512

    rows = {r["doc_id"]: r for r in
            quality_classifier_score(df, model).collect()}
    prose_p = [rows[i]["prob"] for i in range(50)]
    code_p = [rows[i]["prob"] for i in range(50, 100)]
    assert min(prose_p) > 0.5 > max(code_p)

    # exact integer-part parity with an INDEPENDENT featurizer
    def oracle_counts(text):
        words = [w for w in _re.split(r"\s+", text.lower(), flags=_re.ASCII)
                 if w]
        c: dict = {}
        for g in (1, 2):
            for i in range(len(words) - g + 1):
                b = _zlib.crc32(" ".join(words[i:i + g]).encode()) % 512
                c[b] = c.get(b, 0) + 1
        return c

    W = model["weights_e6"]
    for r in df.collect():
        cnt = oracle_counts(r["text"])
        assert rows[r["doc_id"]]["qdot_e6"] == sum(
            k * W[b] for b, k in cnt.items()
        )
        assert rows[r["doc_id"]]["n_grams"] == sum(cnt.values())

    # deterministic + layout-invariant fit and score
    assert quality_classifier_fit(
        pos.repartition(7), neg.repartition(3), buckets=512
    ) == model
    again = {r["doc_id"]: r for r in quality_classifier_score(
        df.repartition(13), model
    ).collect()}
    assert all(
        tuple(rows[i]) == tuple(again[i]) for i in rows
    )

    # NULL text -> NULL; gram-less text -> (0, 0, sigmoid(bias))
    edge = quality_classifier_score(
        spark.createDataFrame(
            [(1, None), (2, "   ")], "doc_id long, text string"
        ),
        model,
    ).collect()
    e = {r["doc_id"]: r for r in edge}
    assert e[1]["qdot_e6"] is None and e[1]["prob"] is None
    assert e[2]["qdot_e6"] == 0 and e[2]["n_grams"] == 0
    want = 1.0 / (1.0 + _math.exp(-model["bias_e6"] / 1e6))
    assert abs(e[2]["prob"] - want) < 1e-12

    # refusals
    import pytest as _pytest

    empty = spark.createDataFrame([], "text string")
    with _pytest.raises(ValueError, match="non-empty positive"):
        quality_classifier_fit(empty, neg, buckets=64)
    with _pytest.raises(ValueError, match="non-empty negative"):
        quality_classifier_fit(pos, empty, buckets=64)
    blank = spark.createDataFrame([(" ",)], "text string")
    with _pytest.raises(ValueError, match="BOTH sides"):
        quality_classifier_fit(pos, blank, buckets=64)
    with _pytest.raises(ValueError, match="not a quality_classifier"):
        quality_classifier_score(df, {"format": "nope"})
    with _pytest.raises(ValueError, match="corrupt qcls"):
        quality_classifier_score(
            df, dict(model, weights_e6=model["weights_e6"][:5])
        )


def test_normalize_text_unicode_and_cleanup(spark):
    """normalize_text (r12): NFC recomposition (decomposed accent →
    composed), control stripping (tab/newline survive), space/tab run
    collapsing, paragraph preservation, trim, NULL propagation — and
    bit-parity with the DuckDB utf8proc twin across the unicodedata/
    utf8proc pair."""
    import unicodedata

    import duckdb
    import pytest

    from etl_workflow_spark.operators.text import (
        normalize_text,
        normalize_text_oracle,
    )

    decomposed = "café latte"
    rows = [
        (1, decomposed),
        (2, "tabs\tand   runs \t here"),
        # NUL is asserted Spark-side only below: DuckDB VARCHAR
        # truncates at embedded NUL (a storage-layer property, not an
        # operator divergence), so the parity fixture stays NUL-free
        (3, "a\x01b\x1fc\x7fd\x9fe"),
        (4, "p1\n\n\n\n\np2\nkept\tline"),
        (5, None),
        (6, "  outer trim  "),
        (7, "ligature ﬁle stays under NFC"),
        (8, "already clean"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in normalize_text(df).collect()}
    assert got[1]["text_norm"] == unicodedata.normalize("NFC", decomposed)
    assert got[1]["text_norm"] != decomposed and got[1]["changed"] is True
    assert got[2]["text_norm"] == "tabs and runs here"
    assert got[3]["text_norm"] == "abcde"
    nul = spark.createDataFrame(
        [(9, "a\x00b")], "doc_id long, text string"
    )
    assert normalize_text(nul).collect()[0]["text_norm"] == "ab"
    assert got[4]["text_norm"] == "p1\n\np2\nkept line"
    assert got[5]["text_norm"] is None and got[5]["changed"] is None
    assert got[6]["text_norm"] == "outer trim"
    # NFC does NOT decompose ligatures (that is NFKC's job)
    assert got[7]["changed"] is False
    assert got[8]["changed"] is False
    # NFKC form goes further (pytest-tier only; no DuckDB twin)
    nfkc = {r["doc_id"]: r["text_norm"]
            for r in normalize_text(df, form="NFKC").collect()}
    assert nfkc[7] == "ligature file stays under NFC"
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text(df, form="NFX")
    # cross-engine: utf8proc must agree with unicodedata on all rows
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in rows)
        + ") v(doc_id, text)",
        [x for row in rows for x in row],
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(normalize_text_oracle(table="t")).fetchall()
    }
    assert {k: (r["text_norm"], r["changed"])
            for k, r in got.items()} == want


def test_compression_ratio_signal(spark):
    """compression_ratio (r12): exact zlib replay per row, repetitive
    text compresses far below varied text, NULL/empty -> NULL ratio,
    level is pinned and honored."""
    import zlib

    from etl_workflow_spark.operators.text import compression_ratio

    rows = [
        (1, "spam " * 400),
        (2, "The quick brown fox jumps over the lazy dog and then "
            "wanders across seventeen distinct meadows naming each."),
        (3, None),
        (4, ""),
        (5, "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    for i, t in rows:
        if t is None:
            assert out[i]["compressed_bytes"] is None
            assert out[i]["compression_ratio_e4"] is None
            continue
        raw = t.encode("utf-8")
        assert out[i]["raw_bytes"] == len(raw)
        assert out[i]["compressed_bytes"] == len(zlib.compress(raw, 6))
        if raw:
            assert out[i]["compression_ratio_e4"] == (
                len(zlib.compress(raw, 6)) * 10000
            ) // len(raw)
        else:
            assert out[i]["compression_ratio_e4"] is None
    # the signal separates: heavy repetition compresses much harder
    assert out[1]["compression_ratio_e4"] < 500
    assert out[2]["compression_ratio_e4"] > 5000
    # pinned level is honored (level 1 compresses worse than 9)
    l1 = compression_ratio(df.where("doc_id = 1"), level=1).collect()[0]
    l9 = compression_ratio(df.where("doc_id = 1"), level=9).collect()[0]
    assert l1["compressed_bytes"] >= l9["compressed_bytes"]


def test_lm_score_bigram_model(spark):
    """lm_score (r12): hand-computed Laplace-smoothed bigram log
    probs, fixed-point accounting (floor BEFORE sum, multiplicity
    AFTER floor), OOV under a foreign model, degenerate docs."""
    import math

    from etl_workflow_spark.operators.text import lm_score

    docs = spark.createDataFrame(
        [
            (1, "a b a b"),
            (2, "a a"),
            (3, "z"),           # one token: nothing to measure
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    # corpus: tokens a×5(?) compute: doc1 a,b,a,b doc2 a,a doc3 z
    # U: a=4, b=2, z=1 -> V=3
    # bigrams: (a,b)=2, (b,a)=1, (a,a)=1
    def lp(cb, cu):
        return math.floor(math.log((cb + 1.0) / (cu + 3)) * 1e9)

    # doc1 pairs: (a,b)x2, (b,a)x1
    want1 = lp(2, 4) * 2 + lp(1, 2) * 1
    assert out[1]["n_pairs"] == 3
    assert out[1]["logprob_e9_sum"] == want1
    assert out[1]["avg_nll_e6"] == ((-want1) // 3) // 1000
    # doc2: (a,a)x1
    assert (out[2]["n_pairs"], out[2]["logprob_e9_sum"]) == (1, lp(1, 4))
    for d in (3, 4, 5):
        assert out[d]["n_pairs"] == 0
        assert out[d]["logprob_e9_sum"] is None
        assert out[d]["avg_nll_e6"] is None
    # foreign model: score under counts that know nothing about 'a b'
    uni = spark.createDataFrame(
        [("x", 10), ("y", 5)], "token string, count long"
    )
    big = spark.createDataFrame(
        [("x", "y", 4)], "w1 string, w2 string, n_pair long"
    )
    oov = {r["doc_id"]: r for r in lm_score(
        docs, unigrams=uni, bigrams=big).collect()}
    # every pair is OOV: logp = ln(1 / (0 + 2)) per pair
    per = math.floor(math.log(1.0 / 2) * 1e9)
    assert oov[1]["logprob_e9_sum"] == per * 3
    assert oov[1]["avg_nll_e6"] == ((-per * 3) // 3) // 1000
    # a high-probability in-model bigram scores better than an unseen
    # one UNDER THE SAME HISTORY token (apples-to-apples smoothing:
    # ln((4+1)/(10+2)) vs ln((0+1)/(10+2)))
    known = spark.createDataFrame(
        [(9, "x y"), (10, "x z")], "doc_id long, text string"
    )
    k = {r["doc_id"]: r for r in lm_score(
        known, unigrams=uni, bigrams=big).collect()}
    assert k[9]["avg_nll_e6"] < k[10]["avg_nll_e6"]
    import pytest

    with pytest.raises(ValueError, match="non-empty unigram"):
        lm_score(
            docs,
            unigrams=uni.where("token = 'nope'"),
            bigrams=big,
        ).collect()


def test_lm_score_backoff_trigram_model(spark):
    """lm_score_backoff (r13): hand-computed stupid-backoff chain —
    trigram MLE when seen, alpha-discounted bigram when only the
    (w2,w3) bigram is seen, alpha²-discounted Laplace unigram leaf
    otherwise — with the module's fixed-point accounting (floor
    BEFORE the sum, multiplicity AFTER the floor) and degenerate
    docs."""
    import math

    from etl_workflow_spark.operators.text import lm_score_backoff

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),
            (2, "a b d"),
            (3, "x y"),         # two tokens: no trigram context
            (4, None),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score_backoff(docs).collect()}
    # corpus trigrams: (a,b,c)=2 (b,c,a)=1 (c,a,b)=1 (a,b,d)=1;
    # bigrams: (a,b)=3 (b,c)=2 (c,a)=1 (b,d)=1 (x,y)=1 — every doc-1
    # and doc-2 trigram is seen, so all score at the trigram tier
    def e9(x):
        return math.floor(math.log(x) * 1e9)

    want1 = e9(2 / 3) * 2 + e9(1 / 2) * 1 + e9(1 / 1) * 1
    assert out[1]["n_ctx"] == 4
    assert out[1]["logprob_e9_sum"] == want1
    assert out[1]["avg_nll_e6"] == ((-want1) // 4) // 1000
    assert (out[2]["n_ctx"], out[2]["logprob_e9_sum"]) == (1, e9(1 / 3))
    for d in (3, 4, 5):
        assert out[d]["n_ctx"] == 0
        assert out[d]["logprob_e9_sum"] is None
        assert out[d]["avg_nll_e6"] is None
    # foreign model exercising the two backoff branches: trigram table
    # empty, bigram knows (x,y), unigrams know x,y only (N=15, V=2)
    uni = spark.createDataFrame(
        [("x", 10), ("y", 5)], "token string, count long"
    )
    big = spark.createDataFrame(
        [("x", "y", 4)], "w1 string, w2 string, n_pair long"
    )
    tri = spark.createDataFrame(
        [], "w1 string, w2 string, w3 string, n_tri long"
    )
    bo = {r["doc_id"]: r for r in lm_score_backoff(
        spark.createDataFrame(
            [(9, "x y z"), (10, "q x y")], "doc_id long, text string"
        ),
        unigrams=uni, bigrams=big, trigrams=tri,
    ).collect()}
    # (x,y,z): (y,z) unseen -> leaf: 0.4*0.4*((0+1)/(15+2))
    assert bo[9]["logprob_e9_sum"] == math.floor(
        math.log(0.4 * 0.4 * (1.0 / 17.0)) * 1e9
    )
    # (q,x,y): (x,y)=4 seen, c(x)=10 -> alpha tier: 0.4*(4/10)
    assert bo[10]["logprob_e9_sum"] == math.floor(
        math.log(0.4 * (4.0 / 10.0)) * 1e9
    )
    import pytest

    with pytest.raises(ValueError, match="alpha"):
        lm_score_backoff(docs, alpha=0.0)
    with pytest.raises(ValueError, match="non-empty unigram"):
        lm_score_backoff(
            docs, unigrams=uni.where("token = 'nope'"),
            bigrams=big, trigrams=tri,
        ).collect()


def test_phash_media_robustness_and_tiers(spark):
    """r13: the DCT perceptual hash — DCT linearity makes the
    structural contracts exact: a global brightness shift moves only
    the DC coefficient (hamming <= 1), a contrast scale preserves
    every coefficient-vs-median comparison (hamming <= 1), inversion
    flips the gradient structure (large hamming); the distributed
    operator equals the in-process helper on the raw pixels; the fake
    tier replays the shared sha digest; phash pairs flow through the
    banding method switch."""
    import hashlib as hl

    w = h = 32
    base = [
        ((7 * x + 13 * y + (x * y) % 9) % 161) + 40  # 40..200
        for y in range(h) for x in range(w)
    ]

    def png_of(vals):
        return M._png_encode(w, h, 1, bytes(vals))

    bright = [v + 30 for v in base]                  # stays <= 230
    contrast = [round(v * 1.1) for v in base]        # stays <= 220
    inverse = [240 - v for v in base]
    df = spark.createDataFrame(
        [
            (1, bytearray(png_of(base))),
            (2, bytearray(png_of(bright))),
            (3, bytearray(png_of(contrast))),
            (4, bytearray(png_of(inverse))),
        ],
        "doc_id long, payload binary",
    )
    fps = {r["doc_id"]: r["phash"]
           for r in M.phash_media(df, allow_fake=False).collect()}

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(fps[1], fps[2]) <= 1          # brightness: DC bit only
    assert ham(fps[1], fps[3]) <= 1          # contrast: DC bit only
    assert ham(fps[1], fps[4]) > 8           # inversion: structure flips
    # distributed == in-process helper on the same pixels
    assert fps[1] == M._phash_from_pixels(w, h, 1, bytes(base), 8, 32)
    # dHash, by contrast, is gradient-local: brightness shift is also
    # invisible to it (comparisons shift together) — both hashes agree
    # the pair is a near-dup, by different mechanisms
    dfp = {r["doc_id"]: r["dhash"]
           for r in M.dhash_media(df, allow_fake=False).collect()}
    assert ham(dfp[1], dfp[2]) == 0
    # fake tier: the SAME sha digest as dhash (fakes are plumbing)
    junk = b"no pixels here"
    jdf = spark.createDataFrame(
        [(9, bytearray(junk))], "doc_id long, payload binary"
    )
    assert M.phash_media(jdf).collect()[0]["phash"] == (
        int.from_bytes(
            hl.sha256(junk + b":dhash64").digest()[:8], "big"
        ) >> 4
    )
    with pytest.raises(Exception, match="not hashable"):
        M.phash_media(jdf, allow_fake=False).collect()
    with pytest.raises(ValueError, match="dct_dim"):
        M.phash_media(df, hash_size=8, dct_dim=4)
    # pairing through the method switch: brightness/contrast variants
    # band into the base image's cluster; inverse stays out
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in M.image_neardup_pairs(
            df, max_distance=2, method="phash"
        ).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)
    with pytest.raises(ValueError, match="unknown method"):
        M.image_neardup_pairs(df, method="ahash")


def test_lm_score_kn_interpolated_model(spark):
    """lm_score_kn (r13): hand-computed interpolated Kneser-Ney —
    discounted bigram MLE + continuation-weighted back-off mass, the
    continuation counts derived from the bigram table itself; the
    Laplace-floored continuation and the no-observed-continuation
    fallback (document-final histories) both exercised; fixed-point
    accounting as the sibling scorers."""
    import math

    from etl_workflow_spark.operators.text import lm_score_kn

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a a"), (3, "z"), (4, None), (5, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score_kn(docs).collect()}

    # corpus: uni a=4 b=2 z=1 (V=3); big (a,b)=2 (b,a)=1 (a,a)=1
    # (3 types); fanout a->2 b->1; contin b->1 a->2; nv = 3+3 = 6
    def kn(c12, c1, n1f, n1b, nv=6.0):
        p = (
            max(c12 - 0.75, 0.0) / c1
            + (0.75 * n1f / c1) * ((n1b + 1.0) / nv)
        )
        return math.floor(math.log(p) * 1e9)

    want1 = kn(2, 4, 2, 1) * 2 + kn(1, 2, 1, 2)
    assert out[1]["n_pairs"] == 3
    assert out[1]["logprob_e9_sum"] == want1
    assert out[1]["avg_nll_e6"] == ((-want1) // 3) // 1000
    assert out[2]["logprob_e9_sum"] == kn(1, 4, 2, 2)
    for d in (3, 4, 5):
        assert out[d]["n_pairs"] == 0
        assert out[d]["logprob_e9_sum"] is None
    # foreign model: uni x=10 y=5 (V=2); big (x,y)=4 (1 type); nv=3;
    # fanout x->1; contin y->1
    uni = spark.createDataFrame(
        [("x", 10), ("y", 5)], "token string, count long"
    )
    big = spark.createDataFrame(
        [("x", "y", 4)], "w1 string, w2 string, n_pair long"
    )
    probe = spark.createDataFrame(
        [(9, "x y"), (10, "x z"), (11, "q x"), (12, "y y")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["logprob_e9_sum"] for r in lm_score_kn(
        probe, unigrams=uni, bigrams=big).collect()}
    assert got[9] == kn(4, 10, 1, 1, nv=3.0)      # seen bigram
    assert got[10] == kn(0, 10, 1, 0, nv=3.0)     # unseen continuation
    # unseen history q -> pure continuation prob (x never continues)
    assert got[11] == math.floor(math.log((0 + 1.0) / 3.0) * 1e9)
    # history y seen but never starts a bigram -> same fallback
    assert got[12] == math.floor(math.log((1 + 1.0) / 3.0) * 1e9)
    import pytest

    with pytest.raises(ValueError, match="discount"):
        lm_score_kn(docs, discount=1.0)
    with pytest.raises(ValueError, match="non-empty unigram"):
        lm_score_kn(
            docs, unigrams=uni.where("token = 'nope'"), bigrams=big
        ).collect()


def test_lm_score_kn_inconsistent_foreign_tables_stay_finite(spark):
    """r14 (verdict note #2): a caller-supplied bigram table may
    contain a pair whose w1 is MISSING from the caller's unigram
    table (c12 > 0 while c1 = 0 — impossible under self-fit or the
    store path). The interpolated branch would divide by zero; the
    guard routes such rows to the pure-continuation fallback, so the
    score stays finite and matches the pcont hand computation."""
    import math

    from etl_workflow_spark.operators.text import lm_score_kn

    uni = spark.createDataFrame(
        [("x", 10), ("y", 5)], "token string, count long"
    )
    # (ghost, y) has n_pair > 0 but 'ghost' is absent from unigrams
    big = spark.createDataFrame(
        [("x", "y", 4), ("ghost", "y", 7)],
        "w1 string, w2 string, n_pair long",
    )
    probe = spark.createDataFrame(
        [(1, "ghost y"), (2, "x y")], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["logprob_e9_sum"] for r in lm_score_kn(
        probe, unigrams=uni, bigrams=big).collect()}
    # nv = 2 bigram types + 2 vocab = 4; contin y <- {x, ghost} = 2
    pcont_y = math.floor(math.log((2 + 1.0) / 4.0) * 1e9)
    assert got[1] == pcont_y  # finite, via the fallback — not -inf/NaN
    # consistent rows still take the interpolated branch
    want2 = math.floor(math.log(
        max(4 - 0.75, 0.0) / 10.0 + (0.75 * 1 / 10.0) * ((2 + 1.0) / 4.0)
    ) * 1e9)
    assert got[2] == want2


def test_lm_score_backoff_n_arbitrary_order(spark):
    """lm_score_backoff_n (r13): order-4 scoring vs an independent
    python oracle over a foreign model, exercising every tier of the
    backoff chain (full 4-gram hit, 3-gram backoff, 2-gram backoff,
    Laplace leaf); order=3 delegation equals the trigram operator
    byte-for-byte; the generated DuckDB oracle at order 3 equals the
    hand-written trigram oracle; validation guards."""
    import math
    from collections import Counter

    import duckdb

    from etl_workflow_spark.operators.text import (
        adjacent_ngram_counts,
        lm_score_backoff,
        lm_score_backoff_n,
        lm_score_backoff_n_oracle,
        lm_score_backoff_oracle,
    )

    ref_rows = [(100, "a b c d e"), (101, "a b c x y")]
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    counts = {k: adjacent_ngram_counts(ref, k) for k in (1, 2, 3, 4)}
    probes = [
        (1, "a b c d"),    # full 4-gram hit
        (2, "q b c d"),    # -> trigram tier
        (3, "q q c d"),    # -> bigram tier
        (4, "q q q d"),    # -> Laplace leaf
        (5, "a b"),        # too short: n_ctx 0
    ]
    pdf = spark.createDataFrame(probes, "doc_id long, text string")
    got = {r["doc_id"]: r for r in lm_score_backoff_n(
        pdf, order=4, counts=counts).collect()}

    # independent python oracle over the reference token streams
    gram = {k: Counter() for k in (1, 2, 3, 4)}
    for _, text in ref_rows:
        ts = text.split()
        for k in (1, 2, 3, 4):
            for i in range(len(ts) - k + 1):
                gram[k][tuple(ts[i:i + k])] += 1
    V, N = len(gram[1]), sum(gram[1].values())

    def py_score(ts):
        tot = 0
        for i in range(len(ts) - 3):
            win = tuple(ts[i:i + 4])
            p = None
            for k in (4, 3, 2):
                g = gram[k][win[-k:]]
                x = gram[k - 1][win[-k:-1]]
                if g > 0 and x > 0:
                    coeff = 1.0
                    for _ in range(4 - k):
                        coeff = coeff * 0.4 if coeff != 1.0 else 0.4
                    p = g / x if k == 4 else coeff * (g / x)
                    break
            if p is None:
                coeff = 0.4
                for _ in range(2):
                    coeff = coeff * 0.4
                p = coeff * ((gram[1][win[-1:]] + 1.0) / float(N + V))
            tot += math.floor(math.log(p) * 1e9)
        return tot

    for doc_id, text in probes[:4]:
        assert got[doc_id]["logprob_e9_sum"] == py_score(text.split()), (
            doc_id
        )
    assert got[5]["n_ctx"] == 0 and got[5]["logprob_e9_sum"] is None

    # order=3 delegation: the named trigram operator IS the generic one
    tri_counts = {k: adjacent_ngram_counts(ref, k) for k in (1, 2, 3)}
    a = {tuple(r) for r in lm_score_backoff_n(
        pdf, order=3, counts=tri_counts).collect()}
    b = {tuple(r) for r in lm_score_backoff(
        pdf,
        unigrams=tri_counts[1].selectExpr(
            "w1 AS token", "n_gram AS count"
        ),
        bigrams=tri_counts[2].selectExpr("w1", "w2", "n_gram AS n_pair"),
        trigrams=tri_counts[3].selectExpr(
            "w1", "w2", "w3", "n_gram AS n_tri"
        ),
    ).collect()}
    assert a == b

    # generated order-3 oracle == hand-written trigram oracle (DuckDB)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE pages AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in probes)
        + ") v(doc_id, text)",
        [x for row in probes for x in row],
    )
    gen = con.execute(
        lm_score_backoff_n_oracle(table="pages", order=3)
    ).fetchall()
    hand = con.execute(lm_score_backoff_oracle(table="pages")).fetchall()
    assert sorted(gen) == sorted(hand)

    import pytest

    with pytest.raises(ValueError, match="order"):
        lm_score_backoff_n(pdf, order=1)
    with pytest.raises(ValueError, match="outside"):
        lm_score_backoff_n(pdf, order=3, counts={5: counts[4]})


def test_video_neardup_planted_recall_and_fake_chain(spark):
    """r14: video near-dup via frame fingerprints. Pixel tier: two
    1-frame PNG 'videos' whose frames sit 2 dHash bits apart pair
    with (n_matching_frames=1, min_hamming=2); an inverted video does
    not. Fake tier: duplicate payloads match on EVERY sampled frame —
    the count replays the documented sha chain exactly (n_frames from
    the payload digest, frame payload = sha256(payload ‖ idx), frame
    hash = the 60-bit fake dhash) — and min_matching_frames
    thresholds on that count; distinct payloads never pair."""
    import hashlib as hl

    def bits_png(bits):
        px = bytearray()
        for y in range(8):
            row = [100]
            for x in range(8):
                row.append(
                    row[-1] - 10 if (y * 8 + x) in bits else row[-1] + 10
                )
            for v in row:
                px += bytes((v, v, v))
        return M._png_encode(9, 8, 3, bytes(px))

    base = frozenset(range(0, 12))
    near = base ^ {20, 21}
    far = frozenset(range(30, 50))
    df = spark.createDataFrame(
        [(1, bytearray(bits_png(base))),
         (2, bytearray(bits_png(near))),
         (3, bytearray(bits_png(far)))],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["n_matching_frames"], r["min_hamming"])
        for r in M.video_neardup_pairs(df, max_distance=3).collect()
    }
    assert pairs == {(1, 2): (1, 2)}
    kept = {r["doc_id"] for r in M.dedup_videos(df).collect()}
    assert kept == {1, 3}

    # fake tier: the documented chain, replayed by hand
    vid_a = b"not a decodable video payload A"
    vid_b = b"some other opaque payload B"
    nf = 1 + hl.sha256(vid_a).digest()[2] % 8
    k = len(range(0, nf, 2))
    fdf = spark.createDataFrame(
        [(10, bytearray(vid_a)), (11, bytearray(vid_a)),
         (12, bytearray(vid_b))],
        "doc_id long, payload binary",
    )
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_matching_frames"], r["min_hamming"])
        for r in M.video_neardup_pairs(fdf).collect()
    }
    assert got == {(10, 11): (k, 0)}
    # per-frame hash replay: frame i's fingerprint is the fake dhash
    # of the ASCII-hex SHA-256(payload ‖ ':frame:' ‖ i)
    f0 = hl.sha256(vid_a + b":frame:0").hexdigest().encode()
    want0 = int.from_bytes(
        hl.sha256(f0 + b":dhash64").digest()[:8], "big"
    ) >> 4
    frames = M.sample_frames(fdf.where("doc_id = 10"))
    fps = M.dhash_media(
        frames.select("doc_id", F.col("frame_payload").alias("payload"))
    ).collect()
    assert want0 in {r["dhash"] for r in fps}
    # threshold: requiring more shared frames than exist drops the pair
    assert M.video_neardup_pairs(
        fdf, min_matching_frames=k + 1
    ).count() == 0
    assert M.video_neardup_pairs(
        fdf, min_matching_frames=k
    ).count() == 1

    # string ids — even ones containing the separator — survive the
    # composite frame key round-trip
    sdf = spark.createDataFrame(
        [("vid#a", bytearray(vid_a)), ("vid#b", bytearray(vid_a))],
        "doc_id string, payload binary",
    )
    sp = M.video_neardup_pairs(sdf).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in sp] == [("vid#a", "vid#b")]

    with pytest.raises(ValueError, match="unknown method"):
        M.video_neardup_pairs(df, method="ahash")
    with pytest.raises(ValueError, match="min_matching_frames"):
        M.video_neardup_pairs(df, min_matching_frames=0)


def test_decontaminate_media_exact_and_near(spark):
    """r14: image benchmark decontamination — exact perceptual match
    (max_distance=0) drops only byte/near-identical fingerprints;
    raising the distance catches the re-encoded/perturbed benchmark
    copy; NULL payloads and unrelated images pass; benchmark rows need
    no ids."""

    def bits_png(bits):
        px = bytearray()
        for y in range(8):
            row = [100]
            for x in range(8):
                row.append(
                    row[-1] - 10 if (y * 8 + x) in bits else row[-1] + 10
                )
            for v in row:
                px += bytes((v, v, v))
        return M._png_encode(9, 8, 3, bytes(px))

    base = frozenset(range(0, 12))
    near = base ^ {20, 21}          # 2 bits from the benchmark image
    far = frozenset(range(30, 50))
    bench = spark.createDataFrame(
        [(bytearray(bits_png(base)),), (bytearray(b"benchmark junk X"),)],
        "payload binary",
    )
    docs = spark.createDataFrame(
        [
            (1, bytearray(bits_png(base))),       # exact benchmark hit
            (2, bytearray(bits_png(near))),        # near-dup of it
            (3, bytearray(b"benchmark junk X")),   # fake-tier exact hit
            (4, bytearray(bits_png(far))),
            (5, None),
        ],
        "doc_id long, payload binary",
    )
    strict = {r["doc_id"]
              for r in M.decontaminate_media(docs, bench).collect()}
    assert strict == {2, 4, 5}
    loose = {r["doc_id"]
             for r in M.decontaminate_media(
                 docs, bench, max_distance=3
             ).collect()}
    assert loose == {4, 5}
    # empty benchmark: nothing drops
    empty_bench = spark.createDataFrame([], "payload binary")
    assert M.decontaminate_media(docs, empty_bench).count() == 5
    with pytest.raises(ValueError, match="unknown method"):
        M.decontaminate_media(docs, bench, method="ahash")


def test_hamming_single_segment_full_width_mask(spark):
    """r14: max_distance=0 over a 64-bit fingerprint makes the ONE
    pigeonhole segment cover all 64 bits — the mask must wrap to the
    signed-long -1 instead of overflowing the literal; exact matches
    (including negative fingerprints, bit 63 set) still pair."""
    from etl_workflow_spark.operators.dedup import hamming_pairs

    fps = spark.createDataFrame(
        [(1, -42), (2, -42), (3, 7), (4, 7), (5, -1)],
        "doc_id long, fp long",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hamming_pairs(
            fps, max_distance=0, fp_col="fp", bits=64
        ).collect()
    }
    assert pairs == {(1, 2): 0, (3, 4): 0}


# ------------------------------------------------------------- audio


def _wav_bytes(samples, rate=8000, n_ch=1):
    """Uncompressed 16-bit PCM WAV from an int iterable (stdlib
    ``wave`` — an encoder independent of the operator's RIFF parser)."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(n_ch)
    w.setsampwidth(2)
    w.setframerate(rate)
    w.writeframes(
        b"".join(
            struct.pack("<h", max(-32768, min(32767, int(v))))
            for v in samples
        )
    )
    w.close()
    return buf.getvalue()


def _noise_samples(seed, n=8000, amp=12000, extra=0, extra_seed=99):
    """Seeded broadband pseudo-random 'audio' — the H-K paper's
    discriminative regime (stationary pure tones are its documented
    degenerate case)."""
    import random

    rnd = random.Random(seed)
    xr = random.Random(extra_seed)
    return [
        rnd.randint(-amp, amp) + (xr.randint(-extra, extra) if extra else 0)
        for _ in range(n)
    ]


def test_audio_fingerprint_real_tier_contracts(spark):
    """r14 Haitsma–Kalker audio fingerprints, WAV tier. Contracts:
    (a) one frame pair's fingerprint replays under an INDEPENDENT
    spectrum computation (full FFT + direct band sums vs the
    operator's rfft path); (b) global gain and stereo mean-mix leave
    every fingerprint bit-identical (the published invariance — band
    energies scale uniformly, signs cannot flip); (c) a clip shorter
    than one frame yields no rows; (d) sub-fingerprints start at
    frame_idx 1 (frame 0 only seeds the time difference)."""
    import numpy as np

    base = _noise_samples(1)
    rate, mono = M._wav_decode(_wav_bytes(base))
    assert rate == 8000 and len(mono) == 8000

    fps = M._hk_subfingerprints(rate, mono, 256, 128, 16)
    assert fps[0][0] == 1 and len(fps) == 1 + (8000 - 256) // 128 - 1

    # (a) independent replay of frame pair (0, 1): full complex FFT,
    # explicit Hann, direct band-edge arithmetic
    edges = np.geomspace(300.0, 3000.0, 18)
    bins = np.maximum(np.round(edges * 256 / rate).astype(int), 1)
    for i in range(1, len(bins)):
        if bins[i] <= bins[i - 1]:
            bins[i] = bins[i - 1] + 1
    win = np.hanning(256)
    eng = []
    for t in (0, 1):
        spec = np.abs(np.fft.fft(mono[t * 128:t * 128 + 256] * win)) ** 2
        eng.append(
            [spec[bins[b]:bins[b + 1]].sum() for b in range(17)]
        )
    want = 0
    for b in range(16):
        if (eng[1][b] - eng[1][b + 1]) - (eng[0][b] - eng[0][b + 1]) > 0:
            want |= 1 << b
    assert fps[0][1] == want

    # (b) gain + stereo invariance through the full operator
    half_stereo = [v for s in base for v in (s * 0.5, s * 0.5)]
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(base))),
         (2, bytearray(_wav_bytes(half_stereo, n_ch=2)))],
        "doc_id long, payload binary",
    )
    rows = M.audio_fingerprint(
        df, frame_size=256, hop=128, n_bands=32
    ).collect()
    a = sorted((r["frame_idx"], r["afp"]) for r in rows if r["doc_id"] == 1)
    b = sorted((r["frame_idx"], r["afp"]) for r in rows if r["doc_id"] == 2)
    assert a == b and len(a) == 60

    # (c) shorter than one frame: zero rows, not an error
    short = spark.createDataFrame(
        [(9, bytearray(_wav_bytes(base[:100])))],
        "doc_id long, payload binary",
    )
    assert M.audio_fingerprint(
        short, frame_size=256, hop=128
    ).count() == 0

    with pytest.raises(ValueError, match="n_bands"):
        M.audio_fingerprint(df, n_bands=61)
    with pytest.raises(ValueError, match="frame_size"):
        M.audio_fingerprint(df, frame_size=8)
    with pytest.raises(ValueError, match="hop"):
        M.audio_fingerprint(df, hop=0)


def test_audio_fingerprint_fake_chain_replay(spark):
    """r14 fake tier: non-WAV payloads emit the documented
    SQL-replayable chain — frame count = 1 + byte2(SHA-256(payload))
    % 8, sub-fingerprint i = first 15 hex chars of SHA-256(payload ‖
    ':aframe:' ‖ i) masked to n_bands bits — and a WAV whose RATE the
    band layout cannot fit falls to the same chain; allow_fake=False
    refuses both."""
    import hashlib as hl

    raw = b"not audio at all"
    n = 1 + hl.sha256(raw).digest()[2] % 8
    want = {
        (
            i,
            int(
                hl.sha256(raw + b":aframe:" + str(i).encode())
                .hexdigest()[:15],
                16,
            )
            & ((1 << 32) - 1),
        )
        for i in range(n)
    }
    df = spark.createDataFrame(
        [(1, bytearray(raw))], "doc_id long, payload binary"
    )
    got = {
        (r["frame_idx"], r["afp"])
        for r in M.audio_fingerprint(df).collect()
    }
    assert got == want

    # rate-unfit WAV (100 Hz: Nyquist 50 < f_lo 300) → fake tier
    lowrate = _wav_bytes(_noise_samples(5, n=400), rate=100)
    ldf = spark.createDataFrame(
        [(2, bytearray(lowrate))], "doc_id long, payload binary"
    )
    nlow = 1 + hl.sha256(lowrate).digest()[2] % 8
    assert M.audio_fingerprint(ldf).count() == nlow
    with pytest.raises(Exception, match="NotImplementedError|not fingerprintable"):
        M.audio_fingerprint(ldf, allow_fake=False).collect()
    with pytest.raises(Exception, match="NotImplementedError|not fingerprintable"):
        M.audio_fingerprint(df, allow_fake=False).collect()


def test_audio_neardup_planted_recall_and_dedup(spark):
    """r14 audio near-dup: a noisy re-take pairs with its original on
    nearly every frame at Hamming ~0; an unrelated clip pairs with
    nothing; a clip trimmed by a whole number of hops re-pairs where
    its frame grid realigns; min_matching_frames thresholds the pair;
    dedup_audio keeps one clip per cluster (min id, or best quality);
    string ids containing '#' survive the composite frame key."""
    base = _noise_samples(1)
    retake = _noise_samples(1, extra=400)
    other = _noise_samples(2)
    kw = dict(frame_size=256, hop=128, n_bands=32, max_distance=3)
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(base))),
         (2, bytearray(_wav_bytes(retake))),
         (3, bytearray(_wav_bytes(other)))],
        "doc_id long, payload binary",
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): (r["n_matching_frames"], r["min_hamming"])
        for r in M.audio_neardup_pairs(df, **kw).collect()
    }
    assert set(pairs) == {(1, 2)}
    n_match, min_ham = pairs[(1, 2)]
    assert n_match >= 50 and min_ham == 0

    # trim by 16 hops: the realigned tail still pairs
    trim = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(base))),
         (4, bytearray(_wav_bytes(base[2048:])))],
        "doc_id long, payload binary",
    )
    tp = M.audio_neardup_pairs(trim, **kw).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in tp] == [(1, 4)]
    assert tp[0]["n_matching_frames"] >= 30

    # threshold: more shared frames than exist drops the pair
    assert M.audio_neardup_pairs(
        df, min_matching_frames=n_match + 1, **kw
    ).count() == 0

    kept = {r["doc_id"] for r in M.dedup_audio(df, **kw).collect()}
    assert kept == {1, 3}
    qdf = df.withColumn(
        "q", F.when(F.col("doc_id") == 2, 9.0).otherwise(1.0)
    )
    kept_q = {
        r["doc_id"]
        for r in M.dedup_audio(qdf, quality_col="q", **kw).collect()
    }
    assert kept_q == {2, 3}

    sdf = spark.createDataFrame(
        [("clip#a", bytearray(_wav_bytes(base))),
         ("clip#b", bytearray(_wav_bytes(retake)))],
        "doc_id string, payload binary",
    )
    sp = M.audio_neardup_pairs(sdf, **kw).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in sp] == [("clip#a", "clip#b")]

    with pytest.raises(ValueError, match="min_matching_frames"):
        M.audio_neardup_pairs(df, min_matching_frames=0)


def test_decontaminate_frame_media_video_and_audio(spark):
    """r14: frame-level benchmark decontamination. Video: a corpus
    copy of a benchmark clip (fake chain: same payload -> every
    sampled frame matches) drops; unrelated clips and NULL payloads
    pass; min_matching_frames gates the drop (hand-replayed frame
    count). Audio: a noisy WAV re-take of a benchmark clip drops at
    max_distance 3; a fresh clip passes; thresholding works."""
    import hashlib as hl

    vid_a = b"benchmark video payload"
    vid_b = b"clean corpus video payload"
    n_shared = len(range(0, 1 + hl.sha256(vid_a).digest()[2] % 8, 2))
    df = spark.createDataFrame(
        [(1, bytearray(vid_a)), (2, bytearray(vid_b)), (3, None)],
        "doc_id long, payload binary",
    )
    bench = spark.createDataFrame(
        [(bytearray(vid_a),)], "payload binary"
    )
    kept = {r["doc_id"]
            for r in M.decontaminate_videos(df, bench).collect()}
    assert kept == {2, 3}
    # more shared frames than the clip has -> nothing drops
    assert {
        r["doc_id"]
        for r in M.decontaminate_videos(
            df, bench, min_matching_frames=n_shared + 1
        ).collect()
    } == {1, 2, 3}
    assert {
        r["doc_id"]
        for r in M.decontaminate_videos(
            df, bench, min_matching_frames=n_shared
        ).collect()
    } == {2, 3}
    with pytest.raises(ValueError, match="min_matching_frames"):
        M.decontaminate_videos(df, bench, min_matching_frames=0)
    with pytest.raises(ValueError, match="unknown method"):
        M.decontaminate_videos(df, bench, method="ahash")

    # audio: WAV tier end to end
    base = _noise_samples(1)
    retake = _noise_samples(1, extra=400)
    other = _noise_samples(2)
    adf = spark.createDataFrame(
        [(1, bytearray(_wav_bytes(retake))),
         (2, bytearray(_wav_bytes(other))),
         (3, None)],
        "doc_id long, payload binary",
    )
    abench = spark.createDataFrame(
        [(bytearray(_wav_bytes(base)),)], "payload binary"
    )
    akw = dict(frame_size=256, hop=128, n_bands=32)
    akept = {
        r["doc_id"]
        for r in M.decontaminate_audio(
            adf, abench, max_distance=3, **akw
        ).collect()
    }
    assert akept == {2, 3}
    # exact-only (distance 0) still catches most re-take frames; a
    # high threshold lets the clip through
    assert {
        r["doc_id"]
        for r in M.decontaminate_audio(
            adf, abench, max_distance=3, min_matching_frames=1000,
            **akw
        ).collect()
    } == {1, 2, 3}
    with pytest.raises(ValueError, match="min_matching_frames"):
        M.decontaminate_audio(adf, abench, min_matching_frames=0)


def test_audio_quality_stats_and_unparsed(spark):
    """r14 audio_quality: format metadata and fixed-point signal
    stats replay against an independent hand computation (stereo clip
    with one clipped channel: peak reads the RAW channel before
    mixdown; planted leading silence lands in silence_e6; duration
    from rate); opaque payloads get parsed=false with NULL stats —
    no fake tier by design; NULL payloads likewise."""
    import math

    # left channel: half-scale tone-ish ramp with a clipped plateau;
    # right channel: quiet (drags the mono mix down, hiding nothing
    # because peak/clipping read raw channels)
    n = 4000
    left, right = [], []
    for i in range(n):
        if i < 400:
            left.append(0)            # leading silence (mono too)
            right.append(0)
        elif i < 500:
            left.append(32767)        # clipped plateau on ONE channel
            right.append(100)
        else:
            left.append(8000 if i % 2 else -8000)
            right.append(100)
    inter = [v for pair in zip(left, right) for v in pair]
    wavb = _wav_bytes(inter, rate=8000, n_ch=2)
    df = spark.createDataFrame(
        [(1, bytearray(wavb)), (2, bytearray(b"not audio")), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in M.audio_quality(df).collect()}
    r1 = rows[1]
    assert r1["parsed"]
    assert r1["sample_rate"] == 8000 and r1["n_channels"] == 2
    assert r1["n_samples"] == n
    assert r1["duration_ms"] == 500
    assert r1["peak"] == 32767
    # clipping over RAW samples (2n of them): 100 clipped
    assert r1["clipping_e6"] == round(100 / (2 * n) * 1e6)
    # mono mix: silence where |mean(l,r)| < 328 -> the 400 leading
    # pairs plus the plateau/tone regions are loud; mono of
    # (8000,100)/2 = 4050 or (-8000+100)/2=-3950: loud. plateau
    # (32767+100)/2: loud. so exactly 400.
    assert r1["silence_e6"] == round(400 / n * 1e6)
    mono = [(lv + rv) / 2.0 for lv, rv in zip(left, right)]
    want_rms = math.sqrt(sum(v * v for v in mono) / n)
    assert r1["rms_e2"] == round(want_rms * 100)
    for did in (2, 3):
        r = rows[did]
        assert not r["parsed"]
        assert r["sample_rate"] is None and r["rms_e2"] is None
    # threshold knobs are honored
    strict = {
        r["doc_id"]: r
        for r in M.audio_quality(
            df, silence_floor=10000, clip_ceiling=8000
        ).collect()
    }
    assert strict[1]["silence_e6"] > r1["silence_e6"]
    assert strict[1]["clipping_e6"] > r1["clipping_e6"]
