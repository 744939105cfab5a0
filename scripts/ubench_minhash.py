"""Offline microbenchmark of the minhash signature kernel (no Spark):
replays dedup.minhash_signature_udf's per-document work over the sf
fixture's documents column, so kernel variants can be compared without
cluster noise.

    python scripts/ubench_minhash.py [--sf-dir DIR] [--variant current|memo]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from priority_data_pipeline_postgres_db_spark.operators.dedup import (  # noqa: E402
    _N_HASHES,
    _affine_min,
    _affine_params,
    _affine_split,
    _md5_60,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=3)
    args = ap.parse_args()

    texts = pq.read_table(
        os.path.join(args.sf_dir, "documents.parquet"), columns=["text"]
    )["text"].to_pylist()
    print(f"{len(texts)} docs")
    a1, a0, b = _affine_split(_affine_params(_N_HASHES))
    n = args.n

    def run(md5_of):
        t0 = time.time()
        out = []
        for text in texts:
            if not text:
                out.append(None)
                continue
            toks = text.lower().split()
            if len(toks) < n:
                out.append(None)
                continue
            shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
            h60 = np.fromiter(
                (md5_of(s) for s in shingles), dtype=np.int64, count=len(shingles)
            )
            h = (h60 & 0x7FFFFFFF)[None, :]
            out.append(_affine_min(h, a1, a0, b))
        return time.time() - t0, out

    t_cur, ref = run(_md5_60)
    print(f"current: {t_cur:.3f}s")

    cache: dict = {}

    def md5_memo(s):
        v = cache.get(s)
        if v is None:
            v = cache[s] = _md5_60(s)
        return v

    t_memo, out = run(md5_memo)
    print(f"memo:    {t_memo:.3f}s  (cache={len(cache)} entries)")
    # identity check
    for x, y in zip(ref, out):
        if x is None:
            assert y is None
        else:
            assert np.array_equal(x, y)
    print("memo identical")

    # batch-vectorized: one concatenated hash vector for the whole batch,
    # one (64, N) affine transform, per-doc mins via minimum.reduceat
    _MERSENNE = (1 << 61) - 1
    cache2: dict = {}

    def run_batched():
        t0 = time.time()
        hs: list = []
        bounds = [0]
        keep = []
        for text in texts:
            toks = text.lower().split() if text else []
            if len(toks) < n:
                keep.append(False)
                continue
            keep.append(True)
            for s in {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}:
                v = cache2.get(s)
                if v is None:
                    v = cache2[s] = _md5_60(s)
                hs.append(v)
            bounds.append(len(hs))
        h = (np.asarray(hs, dtype=np.int64) & 0x7FFFFFFF)[None, :]
        t = a1 * h
        u = (t >> 31) + ((t & 0x7FFFFFFF) << 30)
        w = (u + a0 * h + b) % _MERSENNE
        mins = np.minimum.reduceat(w, np.asarray(bounds[:-1]), axis=1)
        out2 = []
        j = 0
        for k in keep:
            if not k:
                out2.append(None)
            else:
                out2.append(mins[:, j])
                j += 1
        return time.time() - t0, out2

    t_b, out2 = run_batched()
    print(f"batched+memo: {t_b:.3f}s  (cache={len(cache2)})")
    for x, y in zip(ref, out2):
        if x is None:
            assert y is None
        else:
            assert np.array_equal(x, y)
    print("batched identical")


if __name__ == "__main__":
    main()
