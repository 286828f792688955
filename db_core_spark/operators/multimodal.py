"""Multimodal (image/audio/video) column pipeline: opaque `binary` payloads +
typed metadata, processed in Arrow-batched pandas over mapInPandas.

The Spark-side plumbing — schema contract, batch iteration, partition-
preserving transform, deterministic outputs — is real and tested. The codec
step itself (JPEG/PNG/audio decode) is STUBBED: the image/audio libraries are
not in this container, so `decode_image_stub` raises NotImplementedError
unless `fake=True`, in which case it produces a deterministic fake decode
(dimensions/frames derived from the payload bytes) with the exact shape a
real decoder plugs into. Swapping in PIL/torchaudio is a one-function change;
nothing in the Spark plan moves.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, modality string, "
    "width int, height int, n_frames int, checksum long"
)


def decode_image_stub(payload: bytes, fake: bool) -> tuple[int, int, int]:
    """(width, height, n_frames). Real decoders (PIL.Image.open etc.) are not
    available in this container — see module docstring."""
    if not fake:
        raise NotImplementedError(
            "image/audio codecs not available in this environment; "
            "pass fake=True for the deterministic stub"
        )
    # deterministic fake: dimensions derived from payload content
    w = 16 + payload[0] % 64 if payload else 16
    h = 16 + payload[-1] % 64 if payload else 16
    frames = 1 + len(payload) % 4
    return w, h, frames


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
                w, h, fr = decode_image_stub(data, fake=fake_decode)
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
