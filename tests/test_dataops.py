"""Training-data ops: dedup family, ANN, text analysis, multimodal
plumbing — vs numpy/python oracles."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from graphiti_spark import dataops as D

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today", "en"),
    (1, "the quick brown fox jumps over the lazy dog today", "en"),       # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat today", "en"),       # near dup of 0
    (3, "completely different content about spark and iceberg tables", "en"),
    (4, "der schnelle braune fuchs springt heute", "de"),
    (5, "the quick brown fox jumps over the lazy dog yesterday maybe", "en"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, schema="doc_id long, text string, lang string")


def test_exact_dedup(spark):
    rows = {r["fp"]: (r["keeper_id"], r["n_copies"]) for r in D.exact_dedup(_docs(spark)).collect()}
    assert len(rows) == 5  # 6 docs, one exact pair
    assert (0, 2) in rows.values()


def test_normalized_fingerprint_collapses_whitespace(spark):
    df = spark.createDataFrame(
        [(0, "a  b\tc"), (1, "A b C"), (2, "other")], schema="doc_id long, text string"
    )
    fps = {r["id"]: r["fp"] for r in D.normalized_fingerprint(df).collect()}
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_token_jaccard_pairs(spark):
    got = {(r["a_id"], r["b_id"]): r["jac_x10000"] for r in
           D.token_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert got[(0, 1)] == 10000  # identical token sets
    assert (0, 2) in got and 5000 < got[(0, 2)] < 10000
    assert not any(a == 3 or b == 3 for a, b in got)


def test_ngram_jaccard_pairs(spark):
    # trigram shingles of doc0/doc1: identical -> 1.0; doc0 vs doc2 differ
    # in word 9 of 10, which appears in 2 of the 8 trigram windows:
    # J = 6 / (8 + 8 - 6) = 0.6
    got = {(r["a_id"], r["b_id"]): r["jac_x10000"] for r in
           D.ngram_jaccard_pairs(_docs(spark), n=3, threshold=0.4).collect()}
    assert got[(0, 1)] == 10000
    assert got[(0, 2)] == 6000
    assert not any(a == 3 or b == 3 for a, b in got)
    # word-order sensitivity: same token SET, different order -> the token
    # path calls them duplicates, the n-gram path does not
    shuffled = [(10, "alpha beta gamma delta epsilon", "en"),
                (11, "epsilon delta gamma beta alpha", "en")]
    sdf = spark.createDataFrame(shuffled, schema="doc_id long, text string, lang string")
    assert D.token_jaccard_pairs(sdf, threshold=0.9).count() == 1
    assert D.ngram_jaccard_pairs(sdf, n=3, threshold=0.3).count() == 0
    # short-doc convention: below n words the whole text is one shingle
    short = [(20, "tiny doc", "en"), (21, "tiny doc", "en"), (22, "tiny dog", "en")]
    sdf2 = spark.createDataFrame(short, schema="doc_id long, text string, lang string")
    got2 = {(r["a_id"], r["b_id"]) for r in
            D.ngram_jaccard_pairs(sdf2, n=3, threshold=0.99).collect()}
    assert got2 == {(20, 21)}


def test_minhash_detects_duplicates(spark):
    got = {(r["a_id"], r["b_id"]): r["est_jac"] for r in
           D.minhash_neardup_pairs(_docs(spark), threshold=0.5).collect()}
    assert got.get((0, 1)) == 1.0
    assert (0, 3) not in got


def test_simhash_hamming(spark):
    rows = {(r["a_id"], r["b_id"]): r["hamming"] for r in
            D.simhash_neardup_pairs(_docs(spark), max_hamming=10).collect()}
    assert rows.get((0, 1)) == 0  # identical text -> identical simhash
    assert (0, 3) not in rows
    # exact semantic twin: a pair is reported iff it shares >= 1 of the 4
    # 16-bit bands (the candidate guarantee covers hamming <= 3; beyond
    # that detection is probabilistic BY DESIGN) and hamming <= max
    from hashlib import md5

    def sim(txt):
        toks = txt.split()
        v = 0
        for b in range(64):
            ones = sum(
                (int.from_bytes(md5(t.encode()).digest()[8:], "little") >> b) & 1
                for t in toks
            )
            v |= (1 << b) if 2 * ones > len(toks) else 0
        return v

    sigs = {i: sim(t) for i, t, _ in DOCS}
    want = {}
    for a in sigs:
        for b in sigs:
            if a < b:
                x = sigs[a] ^ sigs[b]
                shares_band = any((x >> (16 * i)) & 0xFFFF == 0 for i in range(4))
                ham = bin(x).count("1")
                if shares_band and ham <= 10:
                    want[(a, b)] = ham
    assert rows == want


def test_ann_topk_vs_numpy(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(30, 8).astype(np.float32)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)], schema="vec_id long, embedding array<float>"
    )
    got = {}
    for r in D.ann_topk(df, n_queries=2, k=5).collect():
        got.setdefault(r["q_id"], []).append((r["rnk"], r["c_id"]))
    # numpy oracle with identical quantization
    q = np.sign(vecs) * np.floor(np.abs(vecs.astype(np.float64)) * 1000 + 0.5)
    norms = np.sqrt((q * q).sum(axis=1))
    cos = (q @ q.T) / np.outer(norms, norms)
    for qi in (0, 1):
        order = sorted(range(2, 30), key=lambda c: (-cos[qi, c], c))[:5]
        want = [(i + 1, c) for i, c in enumerate(order)]
        assert sorted(got[qi]) == want, qi


def test_embedding_neardup_pairs(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0]),
        (2, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, schema="vec_id long, embedding array<float>")
    got = {(r["a_id"], r["b_id"]) for r in D.embedding_neardup_pairs(df, threshold=0.9).collect()}
    assert got == {(0, 1)}


def test_lang_id(spark):
    rows = {r["id"]: r for r in D.lang_id(_docs(spark)).collect()}
    assert rows[0]["predicted_lang"] == "en"
    assert rows[4]["predicted_lang"] == "other"  # German text, no en stopwords


def test_quality_scores(spark):
    rows = {r["id"]: r for r in D.quality_scores(_docs(spark)).collect()}
    assert rows[0]["n_tokens"] == 10
    assert rows[0]["n_uniq_tokens"] == 9  # 'the' twice
    assert rows[0]["uniq_ratio_x1e6"] == 900000


def test_token_stats(spark):
    rows = {(r["lang"],): r for r in D.token_stats(_docs(spark), ["lang"]).collect()}
    assert rows[("de",)]["n_docs"] == 1
    assert rows[("de",)]["total_tokens"] == 6
    assert rows[("en",)]["n_docs"] == 5


def _make_bmp(pixels) -> bytes:
    """Minimal uncompressed 24-bit BMP writer (top row first in `pixels`,
    as (r, g, b) tuples): 54-byte header + bottom-up padded BGR rows."""
    h = len(pixels)
    w = len(pixels[0])
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixels):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (stride - len(line))
    size = 54 + len(body)
    header = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + body


def test_media_metadata_plumbing(spark):
    bmp = _make_bmp([[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]])
    rows = [
        (1, bytes([0xFF, 0xD8]) + b"rest-of-jpeg"),
        (2, b"\x89PNG\r\n\x1a\n" + b"png-body"),
        (3, b"plain bytes"),
        (4, None),
        (5, bmp),
    ]
    df = spark.createDataFrame(rows, schema="media_id long, blob binary")
    got = {r["media_id"]: r for r in D.media_metadata(df).collect()}
    assert got[1]["format"] == "jpeg" and got[1]["n_bytes"] == 14
    assert got[2]["format"] == "png"
    assert got[3]["format"] == "unknown"
    assert got[4]["n_bytes"] == 0
    # BMP dimensions parsed for real from the BITMAPINFOHEADER
    assert got[5]["format"] == "bmp" and (got[5]["width"], got[5]["height"]) == (2, 2)


def test_decode_media_bmp(spark):
    # 2x2: channel means r=(10+40+70+100)/4=55, g=65, b=75
    img = _make_bmp([[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]])
    # 3x1 exercises row padding (3*3=9 bytes -> stride 12)
    wide = _make_bmp([[(255, 0, 0), (0, 255, 0), (0, 0, 255)]])
    rows = [(1, img), (2, wide), (3, b"\xff\xd8jpeg-needs-codec"), (4, None)]
    df = spark.createDataFrame(rows, schema="media_id long, blob binary")
    got = {r["media_id"]: r for r in D.decode_media(df).collect()}
    assert got[1]["decoded"] and (got[1]["width"], got[1]["height"]) == (2, 2)
    assert (got[1]["mean_r_x100"], got[1]["mean_g_x100"], got[1]["mean_b_x100"]) == (
        5500, 6500, 7500,
    )
    assert got[2]["decoded"] and (got[2]["width"], got[2]["height"]) == (3, 1)
    assert got[2]["mean_r_x100"] == got[2]["mean_g_x100"] == got[2]["mean_b_x100"] == 8500
    # formats that need absent codec libs come back undecoded, not crashed
    assert not got[3]["decoded"] and got[3]["width"] is None
    assert not got[4]["decoded"]


def test_png_decode_roundtrip_all_filters():
    """Spec-completeness of the pure-stdlib PNG decode: random pixel
    arrays for every color type, forward-filtered with every scanline
    filter (0-4), must reconstruct bit-exactly after deflate+unfilter."""
    import numpy as np

    from graphiti_spark.datagen import png_encode

    rng = np.random.default_rng(7)
    for nch in (1, 2, 3, 4):
        for _ in range(4):
            h, w = int(rng.integers(1, 13)), int(rng.integers(1, 17))
            px = rng.integers(0, 256, (h, w, nch), dtype=np.uint8)
            filters = rng.integers(0, 5, h)
            blob = png_encode(px, filters)
            dec = D._png_decode(blob)
            assert dec is not None and dec.shape == (h, w, nch)
            assert (dec == px).all()
    # per-row single-filter sanity: each filter alone round-trips too
    for f in range(5):
        px = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
        dec = D._png_decode(png_encode(px, [f] * 5))
        assert (dec == px).all()
    # corrupt and truncated inputs fail closed, not loudly
    assert D._png_decode(blob[:20]) is None
    assert D._png_decode(b"not a png") is None
    assert D._png_decode(blob[:-8]) is not None  # IEND loss is tolerable


def test_media_metadata_png_jpeg_dims(spark):
    """PNG IHDR and JPEG SOF dimension parses are real (no codec)."""
    import numpy as np

    from graphiti_spark.datagen import png_encode

    png = png_encode(np.zeros((4, 9, 3), dtype=np.uint8))
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + bytes(9)
    sof = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + bytes([8])
        + (480).to_bytes(2, "big") + (640).to_bytes(2, "big")
        + bytes([3]) + bytes(9)
    )
    jpeg = b"\xff\xd8" + app0 + sof + b"\xff\xd9"
    rows = [(1, png), (2, jpeg), (3, b"\x89PNG\r\n\x1a\n" + b"torn")]
    df = spark.createDataFrame(rows, schema="media_id long, blob binary")
    got = {r["media_id"]: r for r in D.media_metadata(df).collect()}
    assert got[1]["format"] == "png" and (got[1]["width"], got[1]["height"]) == (9, 4)
    assert got[2]["format"] == "jpeg" and (got[2]["width"], got[2]["height"]) == (640, 480)
    # magic-only blob still classifies as png but yields no dimensions
    assert got[3]["format"] == "png" and got[3]["width"] is None


def test_decode_media_png(spark):
    """Real PNG pixel decode inside decode_media: exact channel means for
    RGB, alpha dropped for RGBA, greyscale broadcast to all channels."""
    import numpy as np

    from graphiti_spark.datagen import png_encode

    rgb = np.array(
        [[(10, 20, 30), (40, 50, 60)], [(70, 80, 90), (100, 110, 120)]],
        dtype=np.uint8,
    )
    rgba = np.dstack([rgb, np.full((2, 2), 7, dtype=np.uint8)])
    grey = np.full((3, 3, 1), 200, dtype=np.uint8)
    rows = [
        (1, png_encode(rgb, filters=[1, 4])),
        (2, png_encode(rgba, filters=[3, 2])),
        (3, png_encode(grey)),
    ]
    df = spark.createDataFrame(rows, schema="media_id long, blob binary")
    got = {r["media_id"]: r for r in D.decode_media(df).collect()}
    assert got[1]["decoded"] and (got[1]["width"], got[1]["height"]) == (2, 2)
    assert (got[1]["mean_r_x100"], got[1]["mean_g_x100"], got[1]["mean_b_x100"]) == (
        5500, 6500, 7500,
    )
    # alpha ignored: same means as the rgb image
    assert (got[2]["mean_r_x100"], got[2]["mean_g_x100"], got[2]["mean_b_x100"]) == (
        5500, 6500, 7500,
    )
    assert got[3]["mean_r_x100"] == got[3]["mean_g_x100"] == got[3]["mean_b_x100"] == 20000


def _make_wav(samples, sample_rate=8000, n_channels=1) -> bytes:
    """Minimal PCM16 RIFF/WAVE writer: `samples` is a flat interleaved
    list of int16 values."""
    body = b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
    block = n_channels * 2
    fmt = (
        (1).to_bytes(2, "little")
        + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + (16).to_bytes(4, "little") + fmt
    chunks += b"data" + len(body).to_bytes(4, "little") + body
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_decode_audio_wav(spark):
    # mono: rms of [3, -4] = sqrt((9+16)/2) = sqrt(12.5) -> 354 x100
    mono = _make_wav([3, -4], sample_rate=8000)
    # stereo interleaved, 2 frames of 2 channels at 4000 Hz -> 0 ms floor
    stereo = _make_wav([100, -100, 100, -100], sample_rate=4000, n_channels=2)
    # an odd-length junk chunk before fmt/data exercises RIFF word alignment
    inner = mono[12:]
    padded = (
        b"RIFF"
        + (4 + 12 + len(inner)).to_bytes(4, "little")
        + b"WAVE"
        + b"JUNK" + (3).to_bytes(4, "little") + b"odd\x00"
        + inner
    )
    rows = [
        (1, mono), (2, stereo), (3, b"ID3mp3-needs-codec"), (4, None), (5, padded),
    ]
    df = spark.createDataFrame(rows, schema="media_id long, blob binary")
    got = {r["media_id"]: r for r in D.decode_audio(df).collect()}
    assert got[1]["decoded"] and got[1]["sample_rate"] == 8000
    assert got[1]["n_channels"] == 1 and got[1]["n_frames"] == 2
    assert got[1]["rms_x100"] == 354 and got[1]["peak_abs"] == 4
    assert got[1]["duration_ms"] == 0  # 2 frames / 8000 Hz floors to 0
    assert got[2]["decoded"] and got[2]["n_channels"] == 2
    assert got[2]["n_frames"] == 2 and got[2]["rms_x100"] == 10000
    # formats that need absent codec libs come back undecoded, not crashed
    assert not got[3]["decoded"] and got[3]["sample_rate"] is None
    assert not got[4]["decoded"]
    assert got[5]["decoded"] and got[5]["rms_x100"] == 354  # junk chunk skipped
    # a stereo blob truncated to an odd sample count: the dangling
    # half-frame is excluded from rms/peak, matching n_frames/duration
    trunc = _make_wav([100, -100, 100, -100, 32000], sample_rate=4000, n_channels=2)
    t = D.decode_audio(
        spark.createDataFrame([(9, trunc)], schema="media_id long, blob binary")
    ).collect()[0]
    assert t["n_frames"] == 2 and t["peak_abs"] == 100 and t["rms_x100"] == 10000
    # and media_metadata sniffs the container
    meta = {r["media_id"]: r for r in D.media_metadata(df).collect()}
    assert meta[1]["format"] == "wav" and meta[3]["format"] == "unknown"


def test_audio_frame_features(spark):
    # 8000 Hz, window 1 ms -> 8 samples/frame; 20 samples -> frames 8/8/4
    samples = [1000] * 8 + [0] * 8 + [2000, -2000, 2000, -2000]
    wav = _make_wav(samples, sample_rate=8000)
    df = spark.createDataFrame(
        [(1, wav), (2, b"not-audio")], schema="media_id long, blob binary"
    )
    got = D.audio_frame_features(df, window_ms=1).orderBy("frame_idx").collect()
    assert [r["media_id"] for r in got] == [1, 1, 1]  # undecodable row drops
    assert [r["n_samples"] for r in got] == [8, 8, 4]
    assert [r["rms_x100"] for r in got] == [100000, 0, 200000]


def _make_y4m(frames, width, height, fps=(25, 1), colorspace="420") -> bytes:
    """Minimal YUV4MPEG2 writer: `frames` is a list of bytes, each one
    full raw planar frame (Y then subsampled U, V)."""
    hdr = (
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} "
        f"Ip A1:1 C{colorspace}\x0a"
    ).encode()
    return hdr + b"".join(b"FRAME\x0a" + f for f in frames)


def test_decode_video_y4m(spark):
    # 4x2 C420: Y = 8 bytes, U = V = 2*1 = 2 bytes each -> 12 bytes/frame
    f0 = bytes([10] * 8) + bytes([128] * 4)
    f1 = bytes([200] * 8) + bytes([128] * 4)
    vid = _make_y4m([f0, f1], 4, 2)
    mono = _make_y4m([bytes([7] * 6)], 3, 2, fps=(30, 1), colorspace="mono")
    truncated = _make_y4m([f0, f1], 4, 2)[:-5]  # second frame incomplete
    rows = [
        (1, vid), (2, mono), (3, b"\x00\x00\x00 ftypisom-mp4"), (4, None),
        (5, truncated),
    ]
    df = spark.createDataFrame(rows, schema="media_id long, blob binary")
    got = {r["media_id"]: r for r in D.decode_video(df).collect()}
    assert got[1]["decoded"] and (got[1]["width"], got[1]["height"]) == (4, 2)
    assert got[1]["n_frames"] == 2 and got[1]["fps_num"] == 25
    assert got[1]["duration_ms"] == 80  # 2 frames at 25 fps
    assert got[1]["colorspace"] == "420"
    assert got[2]["decoded"] and got[2]["n_frames"] == 1
    assert got[2]["colorspace"] == "mono" and got[2]["duration_ms"] == 33
    # compressed containers need absent codecs: undecoded, not crashed
    assert not got[3]["decoded"] and got[3]["width"] is None
    assert not got[4]["decoded"]
    assert got[5]["decoded"] and got[5]["n_frames"] == 1  # only complete frames
    meta = {r["media_id"]: r for r in D.media_metadata(df).collect()}
    assert meta[1]["format"] == "y4m" and meta[1]["width"] == 4
    assert meta[3]["format"] == "unknown"


def test_video_frame_sample(spark):
    # three 2x2 C444 frames (Y/U/V each 4 bytes) with distinct luma
    def frame(y):
        return bytes([y] * 4) + bytes([128] * 8)

    vid = _make_y4m([frame(0), frame(10), frame(255)], 2, 2, colorspace="444")
    df = spark.createDataFrame(
        [(1, vid), (2, b"not-video")], schema="media_id long, blob binary"
    )
    got = D.video_frame_sample(df).orderBy("frame_idx").collect()
    assert [r["media_id"] for r in got] == [1, 1, 1]  # undecodable row drops
    assert [r["frame_idx"] for r in got] == [0, 1, 2]
    assert [r["luma_mean_x100"] for r in got] == [0, 1000, 25500]
    assert [r["luma_max"] for r in got] == [0, 10, 255]
    strided = D.video_frame_sample(df, stride=2).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in strided] == [0, 2]
    with pytest.raises(ValueError):
        D.video_frame_sample(df, stride=0)


def test_lsh_bucketed_ann(spark):
    rng = np.random.RandomState(9)
    base = rng.randn(20, 16).astype(np.float32)
    # make vec 1 a near-copy of vec 0 so they share hyperplane buckets
    base[1] = base[0] + rng.randn(16).astype(np.float32) * 0.01
    df = spark.createDataFrame(
        [(i, base[i].tolist()) for i in range(20)], schema="vec_id long, embedding array<float>"
    )
    queries = df.filter(F.col("vec_id") == 0)
    rows = D.lsh_bucketed_ann(df, queries, k=5).collect()
    got = {r["c_id"]: r["rnk"] for r in rows}
    # the near-duplicate must be found in the same bucket at rank 1
    assert got.get("1") == 1


def test_prefix_filter_lossless_vs_bruteforce(spark):
    """Prefix-filtered candidate generation must be LOSSLESS: for a seeded
    corpus with near-dups planted at every size and threshold boundary,
    the Spark output equals an exact all-pairs python oracle."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    docs, texts = [], {}
    did = 0
    for base_len in (1, 2, 3, 5, 8, 13, 21):
        base = [rng.choice(vocab) for _ in range(base_len)]
        for _ in range(3):
            mutated = list(base)
            if mutated and rng.random() < 0.7:
                mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            if rng.random() < 0.4:
                mutated.append(rng.choice(vocab))
            docs.append((did, " ".join(mutated), "en"))
            texts[did] = mutated
            did += 1
    df = spark.createDataFrame(docs, schema="doc_id long, text string, lang string")
    for threshold in (0.5, 0.8, 0.9):
        got = {
            (r["a_id"], r["b_id"]): r["jac_x10000"]
            for r in D.token_jaccard_pairs(df, threshold=threshold).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(texts), 2):
            sa, sb = set(texts[a]), set(texts[b])
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                want[(a, b)] = round(j * 10000)
        assert got == want, f"threshold={threshold}"


def test_repetition_scores(spark):
    df = spark.createDataFrame(
        [
            (0, "a b a b a", "en"),     # 2-grams: ab, ba, ab, ba -> top 2, all dup
            (1, "x y z", "en"),          # xy, yz -> no repetition
            (2, "solo", "en"),           # < 2 tokens -> omitted
        ],
        schema="doc_id long, text string, lang string",
    )
    rows = {r["id"]: r for r in D.repetition_scores(df).collect()}
    assert set(rows) == {0, 1}
    assert (rows[0]["n_2grams"], rows[0]["top_2gram_n"], rows[0]["dup_2gram_n"]) == (4, 2, 4)
    assert (rows[1]["n_2grams"], rows[1]["top_2gram_n"], rows[1]["dup_2gram_n"]) == (2, 1, 0)


def test_hash_split(spark):
    import hashlib

    df = spark.createDataFrame(
        [(i, f"t{i}", "en") for i in range(200)],
        schema="doc_id long, text string, lang string",
    )
    rows = {r["id"]: (r["bucket"], r["split"]) for r in
            D.hash_split(df, {"train": 0.9, "val": 0.05, "test": 0.05}, salt="s").collect()}
    for i in range(200):
        b = int(hashlib.md5(f"{i}s".encode()).hexdigest()[:12], 16) % 10000
        want = "train" if b < 9000 else ("val" if b < 9500 else "test")
        assert rows[i] == (b, want), i
    # weights must sum to 1
    try:
        D.hash_split(df, {"train": 0.5})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [
            (0, "hello world", "en"),          # 2 ws, 2 bpe
            (1, "it's 42 degrees!!", "en"),     # 3 ws; bpe: it,'s,42,degrees,!! = 5
            (2, "a,b", "en"),                   # 1 ws; bpe: a , b = 3
        ],
        schema="doc_id long, text string, lang string",
    )
    rows = {r["id"]: (r["n_ws_tokens"], r["n_bpe_tokens"]) for r in
            D.bpe_token_count(df).collect()}
    assert rows[0] == (2, 2)
    assert rows[1] == (3, 5)
    assert rows[2] == (1, 3)


def test_hash_split_guards(spark):
    import pytest

    df = spark.createDataFrame([(i, "x", "en") for i in range(4)],
                               schema="doc_id long, text string, lang string")
    with pytest.raises(ValueError):
        D.hash_split(df, {})
    with pytest.raises(ValueError):
        D.hash_split(df, {"train": 0.5, "val": 0.4})  # sums to 0.9
    # boundaries are per-weight integer basis points: 0.3/0.3/0.4 ->
    # 3000/6000/10000 regardless of float accumulation order
    out = D.hash_split(df, {"a": 0.3, "b": 0.3, "c": 0.4})
    for r in out.collect():
        want = "a" if r["bucket"] < 3000 else ("b" if r["bucket"] < 6000 else "c")
        assert r["split"] == want


def test_url_normalize(spark):
    cases = [
        (0, "HtTpS://WWW.Example.COM:443/a/1/?utm_source=feed&id=1&r=1#sec",
         "https://example.com/a/1?id=1&r=1"),
        (1, "https://example.com/a/1?r=1&id=1",
         "https://example.com/a/1?id=1&r=1"),          # param order sorted
        (2, "http://example.com:80/x", "http://example.com/x"),
        (3, "http://example.com:8080/x", "http://example.com:8080/x"),  # non-default kept
        (4, "https://example.com/", "https://example.com"),
        (5, "https://example.com/p?utm_campaign=x", "https://example.com/p"),
        (6, "https://example.com/CaseSensitive/Path", "https://example.com/CaseSensitive/Path"),
        # a '?' INSIDE the fragment is not a query: SPA hash routing must
        # canonicalize to the bare page, identical to the fragment-free crawl
        (7, "https://example.com/p#!/route?x=1", "https://example.com/p"),
        (8, "https://example.com/p", "https://example.com/p"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in cases], schema="doc_id long, url string")
    got = {r["id"]: r["canonical_url"] for r in D.url_normalize(df).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_url_dedup(spark):
    df = spark.createDataFrame(
        [(0, "https://example.com/a"), (1, "HTTPS://EXAMPLE.COM/a/"),
         (2, "https://www.example.com:443/a#f"), (3, "https://example.com/b")],
        schema="doc_id long, url string",
    )
    rows = {r["canonical_url"]: (r["keep_id"], r["n_dups"]) for r in D.url_dedup(df).collect()}
    assert rows["https://example.com/a"] == (0, 3)
    assert rows["https://example.com/b"] == (3, 1)


def test_line_dedup(spark):
    df = spark.createDataFrame(
        [(0, "header\nbody zero\nfooter"),
         (1, "header\nbody one\nfooter"),
         (2, "header\nbody zero\nunique two")],
        schema="doc_id long, text string",
    )
    rows = {r["id"]: (r["n_lines"], r["n_kept"]) for r in D.line_dedup(df).collect()}
    # doc0 keeps all 3 (first occurrence of header/body zero/footer)
    assert rows[0] == (3, 3)
    # doc1 keeps only "body one" (header+footer lost to doc0)
    assert rows[1] == (3, 1)
    # doc2 keeps only "unique two" (header lost to doc0 pos0, body zero to doc0)
    assert rows[2] == (3, 1)
    # kept_md5 = md5 of surviving lines joined in original order
    from hashlib import md5 as _md5

    got = {r["id"]: r["kept_md5"] for r in D.line_dedup(df).collect()}
    assert got[0] == _md5(b"header\nbody zero\nfooter").hexdigest()
    assert got[1] == _md5(b"body one").hexdigest()


def test_ngram_decontaminate(spark):
    shared = "one two three four five six seven eight"  # exactly one 8-gram
    train = spark.createDataFrame(
        [(0, f"prefix words {shared} suffix"), (1, "totally clean document here")],
        schema="doc_id long, text string",
    )
    test = spark.createDataFrame(
        [(10, f"other leading {shared} trailing bits")], schema="doc_id long, text string"
    )
    got = {r["id"]: r["n_hit_grams"] for r in D.ngram_decontaminate(train, test, n=8).collect()}
    assert 0 in got and got[0] >= 1
    assert 1 not in got
    # short docs fall back to the whole-text gram
    t2 = spark.createDataFrame([(2, "tiny doc")], schema="doc_id long, text string")
    s2 = spark.createDataFrame([(11, "tiny doc")], schema="doc_id long, text string")
    got2 = {r["id"]: r["n_hit_grams"] for r in D.ngram_decontaminate(t2, s2, n=8).collect()}
    assert got2 == {2: 1}


def test_pii_redact(spark):
    df = spark.createDataFrame(
        [(0, "mail bob.smith+x@corp.example.org and 10.1.2.3 or call 555-123-4567 ok"),
         (1, "no pii here at all"),
         (2, "two mails a@b.io c@d.net and ip 192.168.0.1 and 8.8.8.8")],
        schema="doc_id long, text string",
    )
    rows = {r["id"]: r for r in D.pii_redact(df).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_ipv4"], rows[0]["n_phones"]) == (1, 1, 1)
    assert (rows[1]["n_emails"], rows[1]["n_ipv4"], rows[1]["n_phones"]) == (0, 0, 0)
    assert (rows[2]["n_emails"], rows[2]["n_ipv4"], rows[2]["n_phones"]) == (2, 2, 0)
    from hashlib import md5 as _md5

    want0 = "mail <EMAIL> and <IP> or call <PHONE> ok"
    assert rows[0]["redacted_md5"] == _md5(want0.encode()).hexdigest()
    assert rows[0]["redacted_len"] == len(want0)
    assert rows[1]["redacted_md5"] == _md5(b"no pii here at all").hexdigest()


def test_stratified_sample(spark):
    import hashlib

    df = spark.createDataFrame(
        [(i, f"t{i}", ["en", "de", "zh"][i % 3]) for i in range(300)],
        schema="doc_id long, text string, lang string",
    )
    fr = {"en": 0.5, "zh": 1.0}
    out = {r["id"]: (r["stratum"], r["bucket"]) for r in
           D.stratified_sample(df, fr, strata_col="lang", salt="m",
                               default_fraction=0.1).collect()}
    for i in range(300):
        lang = ["en", "de", "zh"][i % 3]
        b = int(hashlib.md5(f"{i}m".encode()).hexdigest()[:12], 16) % 10000
        kept = b < {"en": 5000, "zh": 10000}.get(lang, 1000)
        assert (i in out) == kept, i
        if kept:
            assert out[i] == (lang, b)
    # nesting: a 0.2 en-sample is a subset of a 0.5 en-sample
    small = {r["id"] for r in
             D.stratified_sample(df, {"en": 0.2}, strata_col="lang", salt="m").collect()}
    big = {r["id"] for r in
           D.stratified_sample(df, {"en": 0.5}, strata_col="lang", salt="m").collect()}
    assert small <= big and small
    # out-of-range fraction rejected — named and default alike
    try:
        D.stratified_sample(df, {"en": 1.5})
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    try:
        D.stratified_sample(df, {"en": 0.5}, default_fraction=1.5)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_top_ngrams(spark):
    from collections import Counter

    df = _docs(spark)
    got = [(r["gram"], r["n_occurrences"], r["n_docs"])
           for r in D.top_ngrams(df, n=2, k=5).collect()]
    # python oracle over the same corpus
    occ, docs = Counter(), Counter()
    for _, text, _ in DOCS:
        w = text.split()
        grams = [" ".join(w[i:i + 2]) for i in range(len(w) - 1)]
        occ.update(grams)
        docs.update(set(grams))
    want = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert got == [(g, n, docs[g]) for g, n in want]
    # rows come back ordered and capped at k
    assert len(got) == 5


def test_kmeans_assign_vs_numpy(spark):
    # replay the exact integer Lloyd semantics in numpy and require an
    # identical assignment (quantize x1000, first-k init, argmin with
    # lower-cluster ties, floor(sum/count) update, empty keeps previous)
    rng = np.random.RandomState(7)
    vecs = np.round(rng.randn(40, 6), 3).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(len(vecs))],
        schema="vec_id long, embedding array<float>",
    )
    k, rounds = 4, 2
    qv = np.round(vecs * 1000).astype(np.int64)
    cents = qv[:k].copy()
    for _ in range(rounds):
        d = ((qv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the first (lowest) index on ties
        for c in range(k):
            members = qv[assign == c]
            if len(members):
                cents[c] = np.floor(members.sum(axis=0) / len(members)).astype(np.int64)
    d = ((qv[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = {(i, int(d[i].argmin()), int(d[i].min())) for i in range(len(qv))}
    got = {
        (r["vec_id"], r["cluster"], r["dist_sq"])
        for r in D.kmeans_assign(df, k=k, rounds=rounds).collect()
    }
    assert got == want


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # seeds 1 and 2 are identical ([0.001, 0]): round-1 ties drain every
    # member to the lower cluster id, so cluster 2 is EMPTY after round 1
    # and must keep its previous centroid. Cluster 1's centroid then moves
    # toward the far group, so in round 2 the near duplicates fall back to
    # the surviving empty-cluster centroid — cluster 2 reappears in the
    # final assignment only if the keep-previous rule worked.
    pts = [[0.0, 0.0], [0.001, 0.0], [0.001, 0.0], [5.0, 5.0], [5.001, 5.0]]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], schema="vec_id long, embedding array<float>"
    )
    out = {r["vec_id"]: r["cluster"] for r in D.kmeans_assign(df, k=3, rounds=2).collect()}
    assert out[0] == 0
    assert out[1] == out[2] == 2  # proof the emptied centroid survived
    assert out[3] == out[4] == 1
    assert set(out.values()) == {0, 1, 2}


def test_kmeans_empty_input_raises(spark):
    df = spark.createDataFrame([], schema="vec_id long, embedding array<float>")
    try:
        D.kmeans_assign(df, k=3)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "no rows" in str(e)


def test_unigram_surprisal(spark):
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "   "), (3, "a")],
        schema="doc_id long, text string",
    )
    # corpus counts: a=3, b=2, c=1, N=6 -> bits(t) = len(bin 6) - len(bin c)
    # = 3 - {2,2,1} = {a:1, b:1, c:2}
    got = {r["doc_id"]: (r["n_tokens"], r["surprisal_bits"])
           for r in D.unigram_surprisal(df).collect()}
    assert got[0] == (3, 3)   # a a b -> 1+1+1
    assert got[1] == (2, 3)   # b c -> 1+2
    assert got[2] == (0, 0)   # whitespace-only doc still present
    assert got[3] == (1, 1)


def test_dedup_clusters(spark):
    docs = _docs(spark)
    out = {r["doc_id"]: (r["canonical_id"], r["cluster_size"], r["is_canonical"])
           for r in D.dedup_clusters(docs, threshold=0.5).collect()}
    assert len(out) == len(DOCS)  # every doc exactly once
    # doc 1 is an exact dup of doc 0 -> same cluster, canonical 0
    assert out[1][0] == 0 and out[0][0] == 0
    assert out[0][2] is True and out[1][2] is False
    assert out[0][1] == out[1][1] >= 2
    # the german doc shares no shingles with anything
    assert out[4] == (4, 1, True)
    # cluster sizes account for the whole corpus
    canon_sizes = {c: s for (c, s, k) in out.values() if k}
    assert sum(canon_sizes.values()) == len(DOCS)


# ---------------------------------------------------------------------------
# round-4 additions: semantic dedup, host cap, sequence packing, pagerank
# ---------------------------------------------------------------------------


def test_semantic_neardup_pairs_matches_within_cluster_brute_force(spark):
    # two tight clusters + one outlier; pairs must be exactly the
    # same-kmeans-cluster pairs above threshold, nothing cross-cluster
    rng = np.random.RandomState(7)
    base_a = rng.rand(6).astype("float32")
    base_b = -rng.rand(6).astype("float32")
    vecs = []
    for i in range(5):
        vecs.append((i, (base_a + 0.01 * rng.rand(6)).tolist()))
    for i in range(5, 10):
        vecs.append((i, (base_b + 0.01 * rng.rand(6)).tolist()))
    vecs.append((10, (rng.rand(6) - 0.5).tolist()))
    df = spark.createDataFrame(vecs, schema="vec_id long, embedding array<float>")
    got = {
        (r["a_id"], r["b_id"]): (r["cluster"], r["cos_x10000"])
        for r in D.semantic_neardup_pairs(df, k=2, rounds=2, threshold=0.9).collect()
    }
    # brute force: replay the assignment, then same-cluster quantized cosine
    assign = {
        r["vec_id"]: r["cluster"] for r in D.kmeans_assign(df, k=2, rounds=2).collect()
    }
    q = {i: np.round(np.array(v, dtype=np.float64) * 1000).astype(np.int64) for i, v in vecs}
    want = {}
    for a in range(11):
        for b in range(a + 1, 11):
            if assign[a] != assign[b]:
                continue
            cos = float(q[a] @ q[b]) / (
                np.sqrt(float(q[a] @ q[a])) * np.sqrt(float(q[b] @ q[b]))
            )
            if cos >= 0.9:
                want[(a, b)] = (assign[a], int(np.floor(cos * 10000 + 0.5)))
    assert got == want
    assert len(got) >= 10  # both tight clusters produced their C(5,2) pairs


def test_host_cap_top_n_and_partition_invariance(spark):
    rows = [(i, f"h{i % 3}", 100 - i) for i in range(30)]
    # ties: two docs on h0 share ord; lower doc_id must win the rank
    rows += [(100, "h0", 100), (101, "h0", 100)]
    df = spark.createDataFrame(rows, schema="doc_id long, source string, n_chars long")
    got = {
        (r["host"], r["host_rank"]): r["doc_id"]
        for r in D.host_cap(df, per_host=2).collect()
    }
    assert got[("h0", 1)] == 0  # ord 100, doc_id 0 beats 100/101 on id
    assert got[("h0", 2)] == 100
    assert got[("h1", 1)] == 1 and got[("h2", 1)] == 2
    assert len(got) == 6
    # the batch-local prefilter is lossless under any partitioning
    got2 = {
        (r["host"], r["host_rank"]): r["doc_id"]
        for r in D.host_cap(df.repartition(7), per_host=2).collect()
    }
    assert got2 == got


def test_pack_sequences_greedy_exact(spark):
    texts = {
        0: "a b c",             # 3 tokens
        1: "d e",               # 2
        2: "f g h i",           # 4
        3: " ".join("x" * 1 for _ in range(12)),  # 12 tokens: oversized alone
        4: "k",                 # 1
        5: "l m n o p",         # 5
        6: "q r",               # 2
        7: "s",                 # 1
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], schema="doc_id long, text string"
    )
    budget, n_shards = 6, 2
    out = D.pack_sequences(df, budget=budget, n_shards=n_shards).collect()
    got = {r["doc_id"]: (r["shard"], r["seq_id"], r["n_tokens"]) for r in out}
    # python replay of the same rule
    import hashlib

    def shard_of(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) % n_shards

    by_shard = {}
    for i in sorted(texts):
        by_shard.setdefault(shard_of(i), []).append(i)
    want = {}
    for sh, ids in by_shard.items():
        run, sid = 0, 0
        for i in ids:
            n = len(texts[i].split())
            if run > 0 and run + n > budget:
                sid += 1
                run = 0
            want[i] = (sh, sid, n)
            run += n
    assert got == want
    # every doc present exactly once; oversized doc packs alone
    assert len(out) == len(texts)
    sh3, seq3, _ = got[3]
    assert [i for i, (s, q, _) in got.items() if (s, q) == (sh3, seq3)] == [3]


def test_pagerank_integer_exact(spark):
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c")]  # d->c; c dangling
    df = spark.createDataFrame(edges, schema="src string, dst string")
    got = {r["id"]: r["rank_x1e6"] for r in D.pagerank(df, rounds=3).collect()}
    # python replay
    nodes = {"a", "b", "c", "d"}
    outdeg = {"a": 2, "b": 1, "d": 1}
    pr = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += pr[s] // outdeg[s]
        pr = {n: 150_000 + (85 * inc[n]) // 100 for n in nodes}
    assert got == pr
    # sources with no in-edges settle at the floor
    assert got["a"] == 150_000 and got["d"] == 150_000


# ---------------------------------------------------------------------------
# winnowing duplicated-span detection
# ---------------------------------------------------------------------------


def _winnow_py(text: str, k: int = 4, w: int = 4) -> set:
    """Python replay of winnow_fingerprints for one document."""
    import hashlib

    toks = [t for t in text.split() if t]
    if len(toks) < k:
        return set()
    gh = [
        int(hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:12], 16)
        for i in range(len(toks) - k + 1)
    ]
    if len(gh) < w:
        return {min(gh)}
    return {min(gh[j : j + w]) for j in range(len(gh) - w + 1)}


def test_winnow_fingerprints_python_replay(spark):
    texts = [
        (0, "alpha beta gamma delta epsilon zeta eta theta"),
        (1, "one two three four"),          # exactly k tokens -> 1 gram
        (2, "too short here"),               # < k tokens -> no fingerprints
    ]
    df = spark.createDataFrame(texts, schema="doc_id long, text string")
    got: dict[int, set] = {}
    for r in D.winnow_fingerprints(df).collect():
        got.setdefault(r["id"], set()).add(r["fp"])
    assert got.get(0) == _winnow_py(texts[0][1])
    assert got.get(1) == _winnow_py(texts[1][1])
    assert 2 not in got


def test_winnow_dup_span_position_robust(spark):
    # the same 8-token span (>= w + k - 1 = 7 guarantees a shared
    # fingerprint) at DIFFERENT offsets in two otherwise-unrelated docs
    span = "s1 s2 s3 s4 s5 s6 s7 s8"
    df = spark.createDataFrame(
        [
            (0, "unrelated head words here " + span + " tail zero"),
            (1, span + " completely different ending text"),
            (2, "no shared material in this document at all"),
        ],
        schema="doc_id long, text string",
    )
    pairs = {(r["a_id"], r["b_id"]) for r in D.winnow_dup_span_pairs(df).collect()}
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_winnow_dup_span_boilerplate_cap(spark):
    # a span shared by 5 docs with cap 3: every fingerprint of the span
    # lands in >3 docs and is dropped -> no pairs at all
    span = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    df = spark.createDataFrame(
        [(i, f"head{i} alpha{i} " + span) for i in range(5)],
        schema="doc_id long, text string",
    )
    assert D.winnow_dup_span_pairs(df, doc_cap=3).count() == 0
    # and with the cap lifted, all 10 pairs appear
    assert D.winnow_dup_span_pairs(df, doc_cap=64).count() == 10


def test_winnow_no_false_pairs(spark):
    df = spark.createDataFrame(
        [
            (0, "completely distinct first document about rivers and maps"),
            (1, "another text concerning compilers gardens telescopes entirely"),
        ],
        schema="doc_id long, text string",
    )
    assert D.winnow_dup_span_pairs(df).count() == 0


# ---------------------------------------------------------------------------
# hashed linear quality classifier
# ---------------------------------------------------------------------------


def test_quality_classifier_python_replay(spark):
    import hashlib

    def wgt(tok: str) -> int:
        return int(hashlib.md5((tok + ":qw1").encode()).hexdigest()[:12], 16) % 2001 - 1000

    texts = [(0, "alpha beta gamma"), (1, ""), (2, "  "), (3, "alpha alpha")]
    df = spark.createDataFrame(texts, schema="doc_id long, text string")
    got = {r["id"]: r for r in D.quality_classifier_scores(df).collect()}
    assert got[0]["n_toks"] == 3
    assert got[0]["w_sum"] == sum(wgt(t) for t in "alpha beta gamma".split())
    assert got[0]["keep"] == (got[0]["w_sum"] >= 0)
    for empty_id in (1, 2):
        assert got[empty_id]["n_toks"] == 0
        assert got[empty_id]["w_sum"] == 0
        assert got[empty_id]["keep"] is True
    # repeated tokens count every occurrence (bag, not set)
    assert got[3]["w_sum"] == 2 * wgt("alpha")


# ---------------------------------------------------------------------------
# shuffle-key skew profiler
# ---------------------------------------------------------------------------


def test_skew_profile_counts_shares_and_tiebreak(spark):
    rows = [(i, "hot") for i in range(6)] + [(10, "warm"), (11, "warm"), (12, "aa"), (13, "ab")]
    df = spark.createDataFrame(rows, schema="id long, k string")
    got = D.skew_profile(df, "k", top_k=3).collect()
    assert [(r.key, r.n) for r in got] == [("hot", 6), ("warm", 2), ("aa", 1)]
    assert got[0].share_x1e6 == round(6 * 1000000.0 / 10)
    # boundary tie ("aa" vs "ab") resolves by key text ascending
    assert got[2].key == "aa"
