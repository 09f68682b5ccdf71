#!/usr/bin/env python
"""Codec stress: decode N synthetic FLAC + JPEG streams end-to-end and
VERIFY the aggregate checksum against the independently-computed closed
form (r7; results at N=2,000,000 recorded in SCALE.md §Multimodal).

The verification matters: at stress volume a silent bit-level bug would
otherwise hide inside a plausible-looking wall time. Both fixtures are
exactness-by-construction (lossless FLAC; DC-only JPEG blocks), so the
expected checksum is pure arithmetic over the id range.

Usage: python scripts/codec_stress.py [n_streams] [n_partitions]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from jasminegraph_spark.pipeline.multimodal import (  # noqa: E402
    decode_media,
    synthesize_flac,
    synthesize_jpeg,
)
from jasminegraph_spark.session import get_spark  # noqa: E402


def expected_flac(n: int) -> int:
    total = 0
    for lo in range(0, n, 200_000):
        d = np.arange(lo, min(lo + 200_000, n), dtype=np.int64)[:, None]
        ln = 64 + (d % 64)
        j = np.arange(127)[None, :]
        fold = (((((j * 37 + d) % 501) - 250) >> 8) + 128) * (j < ln)
        total += int(fold.sum())
    return total


def expected_jpeg(n: int) -> int:
    total = 0
    for lo in range(0, n, 200_000):
        d = np.arange(lo, min(lo + 200_000, n), dtype=np.int64)
        wb, hb, seed = 1 + d % 3, 1 + d % 2, d % 251
        s = np.zeros(len(d), dtype=np.int64)
        for bx in range(3):
            for by in range(2):
                s += np.where(
                    (bx < wb) & (by < hb), (seed + 17 * bx + 37 * by) % 251, 0
                )
        total += int((64 * s).sum())
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("codec-stress")
    docs = spark.range(0, n).withColumnRenamed("id", "doc_id").repartition(parts)
    for name, synth, expect in (
        ("flac", synthesize_flac, expected_flac),
        ("jpeg", synthesize_jpeg, expected_jpeg),
    ):
        t0 = time.perf_counter()
        row = decode_media(synth(docs)).agg(
            F.count("*").alias("n"), F.sum("body_sum").alias("s")
        ).collect()[0]
        dt = time.perf_counter() - t0
        exp = expect(n)
        ok = row["n"] == n and row["s"] == exp
        verdict = "VERIFIED" if ok else f"MISMATCH got {row['s']} want {exp}"
        print(f"{name}: {n:,} streams in {dt:.1f}s ({n / dt:,.0f}/s) checksum={verdict}")
        if not ok:
            sys.exit(1)


if __name__ == "__main__":
    main()
