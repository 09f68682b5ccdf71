"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The engine treats media as ``binary`` payloads + typed metadata and runs
decode / feature-extract / resize / frame-sample as Arrow-batched Pandas
UDFs over mapInPandas — the Spark-side contract (schema, partitioning, UDF
signature, batch shape) is real and tested; the codec step is STUBBED
(this container has no image/audio libraries): decoders parse a small
deterministic fake header, and the real-codec path raises
NotImplementedError behind an import-try (see _try_real_decode).

Scale notes: payloads stay in executors end-to-end (no driver collect);
mapInPandas streams Arrow batches, so peak memory is one batch of decoded
frames, tunable via spark.sql.execution.arrow.maxRecordsPerBatch. At
100 TB the media table is partitioned by content hash so a shuffle-free
mapInPandas covers decode+featurize in one stage.

Fake payload layout (for tests and the deterministic decode): 16-byte
header = magic 'JGMM' + kind byte + width uint32 + height uint32 + 3
reserved bytes, then width*height payload bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("body_sum", T.LongType(), True),  # Σ payload bytes — oracle checksum
        T.StructField("byte_hist", T.ArrayType(T.DoubleType()), True),
    ]
)

MAGIC = b"JGMM"


def encode_fake_payload(kind: str, width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake media payload (tests / fixtures)."""
    body = bytes(((i * 31 + seed) % 251) for i in range(width * height))
    return MAGIC + kind[:1].encode() + struct.pack("<II", width, height) + b"\x00\x00\x00" + body


def _try_real_decode(kind: str, payload: bytes):
    """Real-codec path — gated on libraries this container doesn't ship."""
    try:
        if kind == "image":
            from PIL import Image  # noqa: F401
        elif kind == "audio":
            import soundfile  # noqa: F401
    except ImportError:
        return None
    raise NotImplementedError("real codec decode not implemented in this environment")


def _decode_one(payload: bytes, kind: str = "image") -> tuple[int, int, bytes]:
    if payload is not None and payload[:4] == MAGIC:
        width, height = struct.unpack("<II", payload[5:13])
        return width, height, payload[16:]
    # non-JGMM container → the real-codec path (stubbed in this env)
    _try_real_decode(kind, payload)
    raise ValueError("unknown media container (expected JGMM fake header)")


def synthesize_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic media-table fixture for environments whose testdata
    has no binary column: (media_id, kind, payload) with kind cycling
    image/audio/video by id and payload = the JGMM fake container with
    width = 8 + id%16, height = 8 + id%8, seed = id%251. Runs as a
    distributed mapInPandas stage (payloads are created ON EXECUTORS, as a
    real ingest would decode-side) — the arithmetic shape lets a SQL
    oracle verify the whole synth → binary → decode path end-to-end."""
    kinds = ("image", "audio", "video")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": [kinds[i % 3] for i in ids],
                    "payload": [
                        encode_fake_payload(
                            kinds[i % 3], 8 + i % 16, 8 + i % 8, seed=i % 251
                        )
                        for i in ids
                    ],
                }
            )

    return docs.select(id_col).mapInPandas(
        fn, "media_id long, kind string, payload binary"
    )


def decode_media(media: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Decode + feature-extract in one mapInPandas stage.

    Output: dimensions + an L1-normalized byte histogram (the stand-in for
    a real embedding/feature vector — deterministic, no codec deps).
    """
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, body = _decode_one(payload, kind)
                arr = np.frombuffer(body, dtype=np.uint8)
                hist = np.histogram(arr, bins=hist_bins, range=(0, 256))[0].astype(float)
                total = hist.sum() or 1.0
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "n_bytes": len(body),
                        "body_sum": int(arr.sum()),
                        "byte_hist": (hist / total).round(6).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.mapInPandas(fn, DECODED_SCHEMA)


def resize_media(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """'Resize' via nearest-neighbor index sampling on the fake payload —
    demonstrates a payload-in/payload-out Pandas UDF stage (output is a
    valid JGMM payload, so stages compose)."""
    import numpy as np

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, kind, payload, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                w, h, body = _decode_one(payload)
                arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)[:, None]
                xi = (np.arange(out_w) * w // out_w)[None, :]
                small = arr[yi, xi]
                new_payload = (
                    MAGIC
                    + (kind or "i")[:1].encode()
                    + struct.pack("<II", out_w, out_h)
                    + b"\x00\x00\x00"
                    + small.tobytes()
                )
                out.append(
                    {"media_id": media_id, "kind": kind, "payload": new_payload, "meta": meta}
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(fn, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling for 'video' payloads: treat each row of the fake
    payload grid as a frame, keep every Nth — a 1:N row expander
    (mapInPandas yielding multiple output rows per input)."""

    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, body = _decode_one(payload)
                arr = np.frombuffer(body, dtype=np.uint8).reshape(h, w)
                for fno in range(0, h, every_n):
                    out.append(
                        {"media_id": media_id, "frame_no": fno, "frame": arr[fno].tobytes()}
                    )
            yield pd.DataFrame(out, columns=["media_id", "frame_no", "frame"])

    return media.mapInPandas(fn, schema)
