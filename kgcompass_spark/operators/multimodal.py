"""Multimodal column handling — image/audio/video as opaque binary columns
with typed metadata (per the build brief: decode libs are not in this
container, so the DECODE step is a deterministic stub; the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is real
and tested).

Pattern: media rows are (id, modality, media binary, meta struct). All
per-byte work happens in ``mapInPandas`` over Arrow batches so a real
decoder (PIL/ffmpeg/torchaudio) drops in by replacing ``_decode_stub`` only.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id string, modality string, feature array<float>, "
    "decode_ok boolean, n_bytes int"
)


def _decode_stub(payload: bytes | None, modality: str) -> list[float]:
    """Deterministic fake decode: 8 floats derived from byte statistics.

    REAL DECODER GOES HERE — e.g. PIL.Image.open / soundfile.read /
    av.open. Not available in this container; the fake is deterministic so
    tests can pin outputs.
    """
    if not payload:
        raise NotImplementedError("empty payload — nothing to decode")
    n = len(payload)
    head = payload[: min(64, n)]
    s = sum(head)
    return [
        float(n),
        float(s % 251),
        float(head[0]),
        float(head[-1]),
        float(min(head)),
        float(max(head)),
        float(len(set(head))),
        1.0 if modality == "image" else 0.0,
    ]


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Feature extraction over media binaries via mapInPandas.

    One Arrow batch in → one batch out; failed decodes yield
    decode_ok=False with an empty feature vector instead of failing the
    task (poison-pill isolation — at 10^12 rows a single bad byte-string
    must not kill a stage).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks, sizes = [], [], []
            for payload, modality in zip(pdf["media"], pdf["modality"]):
                raw = bytes(payload) if payload is not None else b""
                sizes.append(len(raw))
                try:
                    feats.append(_decode_stub(raw, modality))
                    oks.append(True)
                except NotImplementedError:
                    feats.append([])
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "decode_ok": oks,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: explode n_frames metadata into frame
    indices (every_n-th), carrying the binary pointer — the real frame
    decode is the stub above. Pure Catalyst explode, no Python."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ).alias("frame_idx"),
        )
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/bench."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(128 + i))
        meta = (
            (64, 64, None, None)
            if modality == "image"
            else (None, None, 16000, None)
            if modality == "audio"
            else (None, None, None, 30 + i)
        )
        rows.append((f"m{i:04d}", modality, payload, meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
