"""Text-quality functions + multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from kgcompass_spark.functions.text_quality import (
    bpe_ish_token_count,
    detect_language,
    fingerprint,
    quality_score,
    token_count,
)
from kgcompass_spark.operators.multimodal import (
    extract_features,
    frame_sample,
    synth_media,
)


def one(spark, text, col_builder):
    df = spark.createDataFrame([(text,)], "t string")
    return df.select(col_builder(F.col("t")).alias("v")).first()["v"]


def test_token_count(spark):
    assert one(spark, "a b  c\nd", token_count) == 4
    assert one(spark, "", token_count) == 0


def test_bpe_ish_token_count(spark):
    assert one(spark, "hello, world 42", bpe_ish_token_count) == 4  # hello | , | world | 42


def test_quality_score_ordering(spark):
    good = "The quick brown fox jumps over the lazy dog and it is a fine day in the park."
    bad = "xxxxx xxxxx xxxxx xxxxx !!!! 1234"
    assert one(spark, good, quality_score) > one(spark, bad, quality_score)
    assert 0.0 <= one(spark, bad, quality_score) <= 1.0


def test_detect_language(spark):
    assert one(spark, "the cat is in the house and it is warm", detect_language) == "en"
    assert one(spark, "der Hund ist nicht in das Haus und die Katze", detect_language) == "de"
    assert one(spark, "zzz qqq www", detect_language) == "und"


def test_fingerprint_whitespace_stable(spark):
    a = one(spark, "alpha beta gamma delta epsilon", fingerprint)
    b = one(spark, "alpha   beta\tgamma  delta epsilon", fingerprint)
    c = one(spark, "different words entirely here now", fingerprint)
    assert a == b
    assert a != c


def test_multimodal_features(spark):
    media = synth_media(spark, n=12)
    out = extract_features(media)
    rows = out.collect()
    assert len(rows) == 12
    assert all(r["decode_ok"] for r in rows)
    assert all(len(r["feature"]) == 8 for r in rows)
    # deterministic: same input → same features
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert all(again[r["media_id"]] == r["feature"] for r in rows)


def test_multimodal_poison_pill(spark):
    bad = spark.createDataFrame(
        [("x", "image", None, (None, None, None, None))],
        "media_id string, modality string, media binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = extract_features(bad).collect()
    assert rows[0]["decode_ok"] is False
    assert rows[0]["feature"] == []


def test_frame_sample(spark):
    media = synth_media(spark, n=9)
    frames = frame_sample(media, every_n=10)
    vids = media.filter(F.col("modality") == "video").collect()
    got = frames.groupBy("media_id").count().collect()
    assert {r["media_id"] for r in got} == {v["media_id"] for v in vids}


def test_multimodal_png_real_decode(spark):
    """PNG decode is REAL (stdlib struct+zlib, full unfiltering): decoded
    dims come from IHDR and the pixel stats match the closed-form values
    of the generated gradient; corrupt PNGs take the poison-pill path."""
    from kgcompass_spark.operators.multimodal import synth_png_media

    media = synth_png_media(spark, n=10)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(rows) == 10
    for i in range(10):
        r = rows[f"png{i:04d}"]
        if i % 5 == 4:
            assert r["decode_ok"] is False and r["feature"] == []
            continue
        w, h = 4 + i % 5, 3 + i % 4
        assert r["decode_ok"] is True
        assert r["feature"][0] == float(w) and r["feature"][1] == float(h)
        assert r["feature"][2] == 3.0  # RGB channels
        flat = bytes(
            (x * 37 + y * 11 + i + c * 5) % 256
            for y in range(h)
            for x in range(w)
            for c in range(3)
        )
        mean = sum(flat) / len(flat)
        assert abs(r["feature"][3] - round(mean, 4)) < 1e-3
        assert r["feature"][5] == float(min(flat))
        assert r["feature"][6] == float(max(flat))


def test_multimodal_jpeg_dims(spark):
    """JPEG dims are REAL (SOF-marker scan): width/height/components come
    from the SOF0 header; truncated JPEGs take the poison-pill path."""
    from kgcompass_spark.operators.multimodal import synth_jpeg_media

    media = synth_jpeg_media(spark, n=10)
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert len(rows) == 10
    for i in range(10):
        r = rows[f"jpg{i:04d}"]
        if i % 5 == 4:
            assert r["decode_ok"] is False and r["feature"] == []
            continue
        assert r["decode_ok"] is True
        assert r["feature"][0] == float(32 + i * 3)
        assert r["feature"][1] == float(24 + i * 2)
        assert r["feature"][2] == 3.0
        assert r["feature"][7] == 1.0


def test_multimodal_decode_bomb_and_bad_ihdr(spark):
    """ADVICE hardening: a lying IHDR (huge declared dims) and a
    wrong-length IHDR chunk both yield decode_ok=False rows, never an OOM
    or a failed task."""
    import struct as _s
    import zlib as _z

    from kgcompass_spark.operators.multimodal import _PNG_MAGIC

    def chunk(typ, data):
        return (
            _s.pack(">I", len(data)) + typ + data
            + _s.pack(">I", _z.crc32(typ + data) & 0xFFFFFFFF)
        )

    # declared 1e9 x 1e9 RGB → expected raw bytes far beyond the cap
    lying = (
        _PNG_MAGIC
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 1_000_000_000, 1_000_000_000, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    # IHDR chunk with a 10-byte body: passes the truncation check, used to
    # raise struct.error out of the UDF
    short_ihdr = (
        _PNG_MAGIC
        + chunk(b"IHDR", b"\x00" * 10)
        + chunk(b"IDAT", _z.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    # small IDAT that INFLATES huge against small declared dims: bounded by
    # max_length, decode fails on short-pixel-data instead of allocating
    bomb = (
        _PNG_MAGIC
        + chunk(b"IHDR", _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", _z.compress(b"\x00" * (1 << 24)))
        + chunk(b"IEND", b"")
    )
    media = spark.createDataFrame(
        [
            ("lying", "image", lying, (None, None, None, None)),
            ("shorthdr", "image", short_ihdr, (None, None, None, None)),
            ("bomb", "image", bomb, (None, None, None, None)),
        ],
        "media_id string, modality string, media binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows["lying"]["decode_ok"] is False
    assert rows["shorthdr"]["decode_ok"] is False
    # the 2x2 bomb: max_length bounds inflation to the 14 expected bytes —
    # which ARE present, so it decodes fine (all-zero pixels) without ever
    # materializing the 16 MB payload
    assert rows["bomb"]["decode_ok"] is True
    assert rows["bomb"]["feature"][0] == 2.0


def test_repetition_signals(spark):
    """Gopher-style repetition gate: duplicate-line fractions and top
    n-gram character fractions, all per-row Catalyst (no shuffle)."""
    from kgcompass_spark.functions.text_quality import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b\nc d\na b\n\n  \ne f"),
            (2, "x y x y x y x y"),
            (3, ""),
            (4, "one two"),
        ],
        "doc_id int, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", repetition_signals(F.col("text")).alias("s")
        ).select("doc_id", "s.*").collect()
    }
    r1 = rows[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == 0.25          # one of four lines repeats
    assert r1["dup_line_char_frac"] == 0.5      # 6 of 12 line chars
    r2 = rows[2]
    assert r2["top2_char_frac"] == 0.8          # "x y" x4 x3 chars / 15
    # overlapping repeats can push the published formula past 1.0 — same
    # behavior as the reference implementations (count * len / text_len)
    assert r2["top4_char_frac"] > 1.0
    assert rows[3]["n_lines"] == 0 and rows[3]["top3_char_frac"] == 0.0
    assert rows[4]["top4_char_frac"] == 1.0     # degenerate whole-text gram


def test_multimodal_gif_bmp_wav_real_meta(spark):
    """GIF/BMP dims and WAV audio metadata are REAL stdlib parses; each
    format's truncated variant takes the poison-pill path."""
    import struct as _s

    gif = b"GIF89a" + _s.pack("<HH", 320, 200) + bytes([0xF2, 0, 0]) + b"\x3b"
    bmp = (
        b"BM" + _s.pack("<IHHI", 150, 0, 0, 54)
        + _s.pack("<IiiHH", 40, 640, -480, 1, 24) + bytes(100)
    )
    # 16-bit stereo 8kHz, 4 frames of data
    fmt = _s.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    data = bytes(16)
    wav = (
        b"RIFF" + _s.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + _s.pack("<I", len(fmt)) + fmt
        + b"data" + _s.pack("<I", len(data)) + data
    )
    media = spark.createDataFrame(
        [
            ("gif", "image", gif, (None, None, None, None)),
            ("bmp", "image", bmp, (None, None, None, None)),
            ("wav", "audio", wav, (None, None, None, None)),
            ("gifbad", "image", gif[:8], (None, None, None, None)),
            ("wavbad", "audio", wav[:14], (None, None, None, None)),
        ],
        "media_id string, modality string, media binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows["gif"]["feature"][:2] == [320.0, 200.0]
    assert rows["bmp"]["feature"][:3] == [640.0, 480.0, 24.0]
    w = rows["wav"]["feature"]
    assert w[0] == 8000.0 and w[1] == 2.0 and w[2] == 16.0
    assert w[3] == 4.0 and abs(w[4] - 4 / 8000) < 1e-9
    assert rows["gifbad"]["decode_ok"] is False
    assert rows["wavbad"]["decode_ok"] is False


def test_multimodal_mp4_avi_real_meta(spark):
    """MP4 (ISO-BMFF box walk: mvhd duration + tkhd 16.16 dims) and AVI
    (avih main header) video METADATA are real; truncated variants take
    the poison-pill path. Frame decode stays stubbed (needs a codec)."""
    import struct as _s

    def box(typ, body):
        return _s.pack(">I", 8 + len(body)) + typ + body

    mvhd = bytes(4) + bytes(8) + _s.pack(">II", 1000, 12500) + bytes(80)
    tkhd_body = bytes(76) + _s.pack(">II", 640 * 65536, 360 * 65536)
    moov = box(b"moov", box(b"mvhd", mvhd) + box(b"trak", box(b"tkhd", tkhd_body)))
    mp4 = box(b"ftyp", b"isom" + bytes(8)) + moov

    avih = _s.pack("<IIII", 40000, 0, 0, 0) + _s.pack("<I", 250) + bytes(12) + _s.pack("<II", 1280, 720) + bytes(16)
    hdrl = b"LIST" + _s.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + b"avih" + _s.pack("<I", len(avih)) + avih
    avi = b"RIFF" + _s.pack("<I", 4 + len(hdrl)) + b"AVI " + hdrl

    media = spark.createDataFrame(
        [
            ("mp4", "video", mp4, (None, None, None, None)),
            ("avi", "video", avi, (None, None, None, None)),
            ("mp4bad", "video", mp4[:20], (None, None, None, None)),
        ],
        "media_id string, modality string, media binary, "
        "meta struct<width:int,height:int,sample_rate:int,n_frames:int>",
    )
    rows = {r["media_id"]: r for r in extract_features(media).collect()}
    m = rows["mp4"]["feature"]
    assert m[0] == 640.0 and m[1] == 360.0 and abs(m[2] - 12.5) < 1e-9
    a = rows["avi"]["feature"]
    assert a[:4] == [1280.0, 720.0, 250.0, 25.0]
    assert rows["mp4bad"]["decode_ok"] is False


def test_gopher_quality_filter(spark):
    """Composite Gopher gate: first-violation reason in fixed rule order."""
    from kgcompass_spark.functions.text_quality import gopher_quality_filter

    long_good = (
        " ".join(f"alpha{i} beta{i}" for i in range(30)) + " the of and that"
    )  # 64 words, all distinct except the stopword tail — low repetition
    df = spark.createDataFrame(
        [
            (1, "too short"),                              # word_count
            (2, " ".join(f"word{i}" for i in range(60))),  # no stopwords
            (3, long_good),                                # passes
            (4, " ".join(["the office and"] * 30)),        # repetition trips
        ],
        "id int, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select("id", gopher_quality_filter(F.col("text")).alias("g"))
        .select("id", "g.*")
        .collect()
    }
    assert rows[1]["reason"] == "word_count"
    assert rows[2]["reason"] == "stopwords"
    assert rows[3]["keep"] is True and rows[3]["reason"] is None
    assert rows[4]["keep"] is False and rows[4]["reason"].endswith("char_frac")
