"""Micro-bench: per-row scalar vs grouped-batch multimodal kernels
(VERDICT r3 #3) — the mapInPandas inner loops of resize_images /
extract_features, timed on one Arrow-batch-sized pandas frame.

Prints one JSON line with per-image times and speedups. Run on a quiet
host (single process, no Spark).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from batch_geocode_spark import codecs, datagen  # noqa: E402
from batch_geocode_spark.operators.multimodal import (  # noqa: E402
    _features_from_stack,
    _group_decode,
)


def main(n: int = 4000) -> None:
    pdf = datagen.make_images(n, with_bytes=True)
    bufs = pdf["bytes"].to_numpy(object)
    fmts = pdf["fmt"].to_numpy(object)
    out_h = out_w = 8

    def scalar_resize():
        out = []
        for i in range(n):
            img = codecs.decode_image(bufs[i], fmts[i])
            small = codecs.resize_nearest(img, out_h, out_w)
            out.append((codecs.encode_ppm(small), codecs.average_hash(small)))
        return out

    def batch_resize():
        out_bytes = np.empty(n, dtype=object)
        phashes = np.zeros(n, dtype=np.int64)
        groups, fallback = _group_decode(bufs, fmts)
        for idx, imgs in groups:
            h, w = imgs.shape[1:3]
            yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
            xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
            small = np.ascontiguousarray(imgs[:, yi][:, :, xi])
            phashes[idx] = codecs.average_hash_batch(small)
            for j, k in enumerate(idx):
                out_bytes[k] = codecs.encode_ppm(small[j])
        assert not fallback
        return out_bytes, phashes

    def scalar_features():
        return [
            _features_from_stack(codecs.decode_image(bufs[i], fmts[i])[None])[0]
            for i in range(n)
        ]

    def batch_features():
        feats = np.empty(n, dtype=object)
        groups, fallback = _group_decode(bufs, fmts)
        for idx, imgs in groups:
            fm = _features_from_stack(imgs)
            for j, k in enumerate(idx):
                feats[k] = fm[j]
        assert not fallback
        return feats

    def timeit(fn, reps=3):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    sr, br = timeit(scalar_resize), timeit(batch_resize)
    sf, bf = timeit(scalar_features), timeit(batch_features)
    print(
        json.dumps(
            {
                "n_images": n,
                "resize_scalar_us_per_img": round(sr / n * 1e6, 1),
                "resize_batch_us_per_img": round(br / n * 1e6, 1),
                "resize_speedup": round(sr / br, 2),
                "features_scalar_us_per_img": round(sf / n * 1e6, 1),
                "features_batch_us_per_img": round(bf / n * 1e6, 1),
                "features_speedup": round(sf / bf, 2),
            }
        )
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
