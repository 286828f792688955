"""Tests for the stdlib image codec (PPM/PGM/BMP/PNG) and its integration
with the multimodal mapInPandas operators: real image bytes decode for real,
synthetic payloads keep the deterministic stub model."""

from __future__ import annotations

import hashlib
import struct
import zlib

from pyspark.sql import functions as F

from db_core_spark.operators.imagecodec import (
    DecodedImage,
    encode_png_rgb,
    encode_ppm,
    resize_nearest,
    sniff_decode,
)
from db_core_spark.operators.multimodal import (
    decode_binary_features,
    decode_image_dims,
    resize_images,
)


def _gradient_rgb(w: int, h: int) -> bytes:
    return bytes(
        v
        for y in range(h)
        for x in range(w)
        for v in ((x * 7) % 256, (y * 11) % 256, (x + y) % 256)
    )


# ------------------------------------------------------------------ codec


def test_ppm_roundtrip():
    px = _gradient_rgb(5, 3)
    img = DecodedImage(5, 3, 3, px, "ppm")
    dec = sniff_decode(encode_ppm(img))
    assert dec is not None and dec.fmt == "ppm"
    assert (dec.width, dec.height, dec.channels) == (5, 3, 3)
    assert dec.pixels == px


def test_ppm_header_comments_and_pgm():
    # hand-built P5 with a comment line in the header
    payload = b"P5\n# a comment\n4 2\n255\n" + bytes(range(8))
    dec = sniff_decode(payload)
    assert dec is not None and dec.fmt == "pgm"
    assert (dec.width, dec.height, dec.channels) == (4, 2, 1)
    assert dec.pixels == bytes(range(8))


def test_png_roundtrip_filter0():
    px = _gradient_rgb(6, 4)
    dec = sniff_decode(encode_png_rgb(6, 4, px))
    assert dec is not None and dec.fmt == "png"
    assert (dec.width, dec.height, dec.channels) == (6, 4, 3)
    assert dec.pixels == px


def test_png_all_filter_types_invert():
    """Forward-filter each scanline with types 1-4 in the test, then check
    the decoder's inverse recovers the original pixels exactly."""
    w, h, nch = 4, 4, 3
    px = _gradient_rgb(w, h)
    stride = w * nch

    def fwd(ft, line, prev):
        out = bytearray(line)
        if ft == 1:
            for i in range(stride - 1, nch - 1, -1):
                out[i] = (line[i] - line[i - nch]) & 0xFF
        elif ft == 2:
            for i in range(stride):
                out[i] = (line[i] - prev[i]) & 0xFF
        elif ft == 3:
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                out[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                ul = prev[i - nch] if i >= nch else 0
                p = left + prev[i] - ul
                pa, pb, pc = abs(p - left), abs(p - prev[i]), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (prev[i] if pb <= pc else ul)
                out[i] = (line[i] - pred) & 0xFF
        return bytes(out)

    raw = bytearray()
    prev = bytes(stride)
    for row, ft in zip(range(h), (1, 2, 3, 4)):
        line = px[row * stride : (row + 1) * stride]
        raw += bytes([ft]) + fwd(ft, line, prev)
        prev = line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    dec = sniff_decode(png)
    assert dec is not None and dec.pixels == px


def _make_bmp24(w: int, h: int, rgb_topdown: bytes) -> bytes:
    """Build a bottom-up 24-bit BMP (the common layout) from top-down RGB."""
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for row in range(h - 1, -1, -1):  # bottom-up storage
        line = bytearray()
        for col in range(w):
            o = (row * w + col) * 3
            r, g, b = rgb_topdown[o : o + 3]
            line += bytes((b, g, r))  # BGR on disk
        line += bytes(row_bytes - len(line))  # 4-byte row padding
        body += line
    pix_off = 54
    file_size = pix_off + len(body)
    header = (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + bytes(body)


def test_bmp_decode_bottom_up_with_padding():
    px = _gradient_rgb(3, 2)  # odd width -> rows pad on disk
    dec = sniff_decode(_make_bmp24(3, 2, px))
    assert dec is not None and dec.fmt == "bmp"
    assert (dec.width, dec.height, dec.channels) == (3, 2, 3)
    assert dec.pixels == px


def test_weak_bmp_magic_text_is_opaque():
    fake = b"BM" + b"x" * 100  # text that merely starts with BM
    assert sniff_decode(fake) is None
    assert sniff_decode(b"plain text payload") is None


def test_resize_nearest_blocks():
    # 2x2 distinct pixels -> 4x4 of 2x2 blocks
    px = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9))
    img = DecodedImage(2, 2, 3, px, "ppm")
    out = resize_nearest(img, 4, 4)
    assert (out.width, out.height) == (4, 4)
    assert out.pixels[0:3] == bytes((255, 0, 0))
    assert out.pixels[3:6] == bytes((255, 0, 0))
    assert out.pixels[6:9] == bytes((0, 255, 0))
    got_last = out.pixels[-3:]
    assert got_last == bytes((9, 9, 9))


# ------------------------------------------------------- spark integration


def test_real_png_payloads_decode_in_pipeline(spark):
    rows = [
        (1, bytearray(encode_png_rgb(20, 10, _gradient_rgb(20, 10)))),
        (2, bytearray(encode_ppm(DecodedImage(7, 5, 3, _gradient_rgb(7, 5), "ppm")))),
        (3, bytearray(b"not an image at all")),
    ]
    src = spark.createDataFrame(rows, "doc_id long, payload binary").withColumn(
        "modality", F.lit("image")
    )
    feats = {r.doc_id: r for r in decode_binary_features(src, fake_decode=True).collect()}
    assert (feats[1].width, feats[1].height) == (20, 10)  # real PNG dims
    assert (feats[2].width, feats[2].height) == (7, 5)  # real PPM dims
    # doc 3 falls back to the stub model (dims from payload bytes)
    data3 = b"not an image at all"
    assert feats[3].width == 16 + data3[0] % 64
    assert feats[3].height == 16 + data3[-1] % 64


def test_real_resize_digest_matches_local_codec(spark):
    png = encode_png_rgb(20, 10, _gradient_rgb(20, 10))
    src = spark.createDataFrame([(1, bytearray(png))], "doc_id long, payload binary")
    row = resize_images(src, out_w=8, out_h=8).collect()[0]
    expected = encode_ppm(resize_nearest(sniff_decode(png), 8, 8))
    assert (row.src_w, row.src_h) == (20, 10)
    assert row.out_n_bytes == len(expected)
    assert row.out_digest == hashlib.sha256(expected).hexdigest()


def test_decode_image_dims_raises_for_opaque_without_fake():
    try:
        decode_image_dims(b"opaque", fake=False)
        raise AssertionError("expected NotImplementedError")
    except NotImplementedError:
        pass
    # but a real image decodes even with fake=False
    w, h, fr = decode_image_dims(
        encode_png_rgb(4, 3, _gradient_rgb(4, 3)), fake=False
    )
    assert (w, h, fr) == (4, 3, 1)


# ------------------------------------------------------------ properties

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _rgb_images(draw):
    w = draw(st.integers(min_value=1, max_value=12))
    h = draw(st.integers(min_value=1, max_value=12))
    px = draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    return w, h, px


@settings(max_examples=40, deadline=None)
@given(_rgb_images())
def test_png_roundtrip_property(img):
    """encode_png_rgb -> sniff_decode is the identity on any RGB buffer."""
    w, h, px = img
    dec = sniff_decode(encode_png_rgb(w, h, px))
    assert dec is not None
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    assert dec.pixels == px


@settings(max_examples=40, deadline=None)
@given(_rgb_images())
def test_ppm_roundtrip_property(img):
    w, h, px = img
    dec = sniff_decode(encode_ppm(DecodedImage(w, h, 3, px, "ppm")))
    assert dec is not None
    assert (dec.width, dec.height, dec.channels) == (w, h, 3)
    assert dec.pixels == px


@settings(max_examples=25, deadline=None)
@given(
    _rgb_images(),
    st.integers(min_value=1, max_value=16),
    st.integers(min_value=1, max_value=16),
)
def test_resize_property(img, ow, oh):
    """Output dims always honored; every output pixel exists in the source
    (nearest-neighbor never invents colors)."""
    w, h, px = img
    out = resize_nearest(DecodedImage(w, h, 3, px, "ppm"), ow, oh)
    assert (out.width, out.height) == (ow, oh)
    src_pixels = {px[i : i + 3] for i in range(0, len(px), 3)}
    for i in range(0, len(out.pixels), 3):
        assert out.pixels[i : i + 3] in src_pixels


def test_dhash_stable_under_small_perturbation():
    """Perceptual property: flipping one source pixel must move the dHash by
    at most a few bits (hamming-close), while identical payloads hash
    identically — the property that makes banded dHash a near-dup blocker."""
    from db_core_spark.operators.imagecodec import DecodedImage, encode_ppm, sniff_decode
    from db_core_spark.operators.multimodal import dhash64, synth_ppm_for_text

    p1 = synth_ppm_for_text("the quick brown fox", size=24)
    assert dhash64(p1) == dhash64(bytes(p1))
    img = sniff_decode(p1)
    px = bytearray(img.pixels)
    px[0] = (px[0] + 128) % 256  # one-pixel edit
    p2 = encode_ppm(DecodedImage(img.width, img.height, img.channels, bytes(px), "ppm"))
    d = dhash64(p1) ^ dhash64(p2)
    assert bin(d & ((1 << 64) - 1)).count("1") <= 4


def test_dhash_sql_oracle_matches_python_on_random_texts():
    """The DuckDB _DHASH_CTES replica must equal dhash64(synth_ppm_for_text)
    for ARBITRARY ASCII text, not just the fixture corpus — hypothesis
    drives random keystream seeds through both engines. This is the
    equivalence the round-6 multimodal oracle conversions rest on; a drift
    in either side (resize index map, luminance weights, bit order, signed
    fold, keystream encoding) fails here before any fixture changes."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from db_core_spark.operators.imagecodec import DecodedImage, encode_ppm, sniff_decode
    from db_core_spark.operators.multimodal import dhash64, synth_ppm_for_text
    from db_core_spark.queries.objects import _DHASH_CTES

    con = duckdb.connect()

    @settings(max_examples=25, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                                   exclude_characters="'"),
            min_size=0,
            max_size=200,
        )
    )
    def check(text):
        payload = synth_ppm_for_text(text)
        expected = dhash64(payload)
        # edit0=TRUE branch (ADVICE r6: previously only fixture-exercised):
        # SQL adds 128 to keystream byte 0; Python edits the DECODED pixel
        # and re-encodes — equivalent because the synth image's pixel 0 IS
        # keystream byte 0. Both engines must agree for arbitrary text.
        img = sniff_decode(payload)
        px = bytearray(img.pixels)
        px[0] = (px[0] + 128) % 256
        expected_edit = dhash64(
            encode_ppm(DecodedImage(img.width, img.height, img.channels, bytes(px), "ppm"))
        )
        sql = f"""
        WITH alldocs(doc_id, text, edit0) AS
          (VALUES (0, '{text}', FALSE), (1, '{text}', TRUE)),
        {_DHASH_CTES}
        SELECT doc_id, dhash FROM dh ORDER BY doc_id
        """
        rows = con.execute(sql).fetchall()
        assert rows[0][1] == expected, f"text={text!r}: sql={rows[0][1]} python={expected}"
        assert rows[1][1] == expected_edit, (
            f"text={text!r} edit0: sql={rows[1][1]} python={expected_edit}"
        )

    check()


def test_vad_energy_sql_matches_python_on_random_texts():
    """Same equivalence for the audio VAD oracle: per-frame energies of the
    PCM keystream computed by the SQL fold must equal the pandas path for
    arbitrary ASCII text and doc_id parity (which flips speech/silence
    segment placement)."""
    import math

    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    con = duckdb.connect()

    def py_frames(text: str, doc_id: int):
        seg_bytes, window, hop, n_segs = 1024, 512, 256, 4
        buf = bytearray()
        for s in range(n_segs):
            if (doc_id + s) % 2 == 0:
                seed = f"{text}:aud{s}|".encode()
                chunk = bytearray()
                ctr = 0
                while len(chunk) < seg_bytes:
                    chunk.extend(hashlib.md5(seed + str(ctr).encode()).digest())
                    ctr += 1
                buf.extend(chunk[:seg_bytes])
            else:
                buf.extend(b"\x80" * seg_bytes)
        out = {}
        i = 0
        while i * hop < len(buf):
            frame = buf[i * hop : i * hop + window]
            energy = sum((b - 128) ** 2 for b in frame) / len(frame)
            out[i] = math.floor(energy * 10000 + 0.5) / 10000
            i += 1
        return out

    @settings(max_examples=10, deadline=None)
    @given(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126,
                                   exclude_characters="'"),
            min_size=0,
            max_size=80,
        ),
        st.integers(0, 3),
    )
    def check(text, doc_id):
        sql = f"""
        WITH base(doc_id, text) AS (VALUES ({doc_id}, '{text}')),
        sbytes AS (
          SELECT d.doc_id, g.g AS idx,
                 ('0x' || substr(
                    md5(d.text || ':aud' || CAST(g.g // 1024 AS VARCHAR) || '|'
                        || CAST((g.g % 1024) // 16 AS VARCHAR)),
                    2*((g.g % 1024) % 16) + 1, 2))::INT - 128 AS dev
          FROM base d, generate_series(0,4095) g(g)
          WHERE (d.doc_id + g.g // 1024) % 2 = 0),
        contrib AS (
          SELECT doc_id, idx // 256 AS f, dev*dev AS sq FROM sbytes
          UNION ALL
          SELECT doc_id, idx // 256 - 1, dev*dev FROM sbytes WHERE idx // 256 >= 1),
        frame_spine AS (
          SELECT d.doc_id, f.g AS frame_no,
                 CASE WHEN f.g = 15 THEN 256 ELSE 512 END AS flen
          FROM base d, generate_series(0,15) f(g)),
        ssqs AS (
          SELECT doc_id, f, SUM(sq) AS ssq FROM contrib WHERE f <= 15 GROUP BY 1, 2)
        SELECT fs.frame_no,
               FLOOR(COALESCE(s.ssq, 0) * 10000.0 / fs.flen + 0.5) / 10000.0
        FROM frame_spine fs
        LEFT JOIN ssqs s ON s.doc_id = fs.doc_id AND s.f = fs.frame_no
        ORDER BY fs.frame_no
        """
        got = dict(con.execute(sql).fetchall())
        assert got == py_frames(text, doc_id)

    check()
