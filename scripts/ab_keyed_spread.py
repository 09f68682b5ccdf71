#!/usr/bin/env python
"""Interleaved A/B: round-robin spread_scan vs keyed (hash by doc_id)
spread for the shingle-family operators (r14, guide §2.4/§2.5).

Both variants run in ONE session, alternating A/B/A/B..., noop sink,
clearCache between runs — the box drifts between sessions, interleaving
cancels it.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from jasminegraph_spark import pipeline as pl  # noqa: E402
from jasminegraph_spark.session import get_spark, spread_scan  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("AB_RUNS", "4"))


def main() -> None:
    spark = get_spark("ab-keyed-spread")

    def docs_rr():
        return spread_scan(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            key=("documents", SF_DIR),
        )

    def docs_keyed():
        return spread_scan(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            key=("documents", SF_DIR),
            by="doc_id",
        )

    ops = {
        "simhash": lambda d: pl.simhash_signatures(d, bits=16, k=8),
        "minhash_lsh": lambda d: pl.minhash_lsh_candidates(
            d, num_hashes=16, bands=4, k=8
        ),
        "lsh_verified": lambda d: pl.jaccard_verified_dedup(
            d, num_hashes=16, bands=4, k=8, threshold=0.4
        ),
    }

    def run(op, mk):
        t0 = time.perf_counter()
        op(mk()).write.mode("overwrite").format("noop").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    for name, op in ops.items():
        # warmup both variants once
        run(op, docs_rr)
        run(op, docs_keyed)
        a, b = [], []
        for _ in range(N):
            spark.sparkContext.setJobDescription(f"ab:{name}:rr")
            a.append(run(op, docs_rr))
            spark.sparkContext.setJobDescription(f"ab:{name}:keyed")
            b.append(run(op, docs_keyed))
        print(
            f"{name}: rr min={min(a):.3f} samples={[round(x,3) for x in a]} | "
            f"keyed min={min(b):.3f} samples={[round(x,3) for x in b]}"
        )


if __name__ == "__main__":
    main()
