"""Multimodal (binary-column) operators over the image+caption table.

The input_hint table carries images as an opaque ``binary`` column with
typed metadata (w, h, fmt, phash). All operators here are Arrow-batched
``mapInPandas`` stages — the Spark-side plumbing (schema, partitioning,
UDF signatures, batch shapes) is fully real; the pixel work uses the
vendored numpy codecs (PIL/cv2 absent, see codecs.py).

Scale notes: these stages are embarrassingly parallel maps — no shuffle,
no state; partition sizing is governed by
``spark.sql.files.maxPartitionBytes`` on the scan and Arrow batch size.
Keep the ``bytes`` column OUT of every non-pixel pipeline (select early)
so Parquet column pruning drops the payload — at 10^12 rows the payload
is the table; see SURVEY.md §4 'column pruning'.

Audio/video decoding is stubbed (no codec libs in this container) behind
clearly-marked NotImplementedError with the real operator signature.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from batch_geocode_spark import codecs


def validate_images(images: DataFrame) -> DataFrame:
    """Decode every image, recompute the perceptual hash, and report
    integrity: (image_id, fmt, decode_ok, dims_ok, phash_match,
    phash_hamming, mean_px). The input_hint integrity check."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for r in pdf.itertuples():
                try:
                    img = codecs.decode_image(r.bytes, r.fmt)
                    ph = codecs.average_hash(img)
                    ham = bin((ph ^ r.phash) & (2**64 - 1)).count("1")
                    rows.append(
                        (
                            r.image_id,
                            r.fmt,
                            True,
                            img.shape[0] == r.h and img.shape[1] == r.w,
                            ph == r.phash,
                            ham,
                            float(img.mean()),
                        )
                    )
                except Exception:  # noqa: BLE001 — malformed payloads become rows
                    rows.append((r.image_id, r.fmt, False, False, False, 64, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "image_id",
                    "fmt",
                    "decode_ok",
                    "dims_ok",
                    "phash_match",
                    "phash_hamming",
                    "mean_px",
                ],
            )

    schema = (
        "image_id string, fmt string, decode_ok boolean, dims_ok boolean, "
        "phash_match boolean, phash_hamming int, mean_px double"
    )
    return images.select("image_id", "bytes", "w", "h", "fmt", "phash").mapInPandas(
        run, schema=schema
    )


def resize_images(images: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (lossless ppm).
    Captions and ids pass through untouched (byte-equality invariant)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_bytes, phashes = [], []
            for r in pdf.itertuples():
                img = codecs.decode_image(r.bytes, r.fmt)
                small = codecs.resize_nearest(img, out_h, out_w)
                out_bytes.append(codecs.encode_ppm(small))
                phashes.append(codecs.average_hash(small))
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"].to_numpy(),
                    "bytes": out_bytes,
                    "w": np.int32(out_w),
                    "h": np.int32(out_h),
                    "fmt": "ppm",
                    "caption": pdf["caption"].to_numpy(),
                    "phash": np.asarray(phashes, dtype=np.int64),
                }
            )

    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    return images.mapInPandas(run, schema=schema)


FEATURE_DIM = 12


def extract_features(images: DataFrame) -> DataFrame:
    """Per-image feature vector (channel means/stds + 2×2 spatial
    luminance grid + aspect) as array<float> — the feature-extraction
    stage of a training-data pipeline; swap the kernel for a real model
    without touching the plan."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, feats = [], []
            for r in pdf.itertuples():
                img = codecs.decode_image(r.bytes, r.fmt).astype(np.float32)
                h, w = img.shape[:2]
                lum = img.mean(axis=2)
                grid = [
                    float(lum[: h // 2, : w // 2].mean()),
                    float(lum[: h // 2, w // 2 :].mean()),
                    float(lum[h // 2 :, : w // 2].mean()),
                    float(lum[h // 2 :, w // 2 :].mean()),
                ]
                v = (
                    [float(img[:, :, c].mean()) for c in range(3)]
                    + [float(img[:, :, c].std()) for c in range(3)]
                    + grid
                    + [float(w) / float(h), float(lum.std())]
                )
                ids.append(r.image_id)
                feats.append(np.asarray(v, dtype=np.float32))
            yield pd.DataFrame({"image_id": ids, "features": feats})

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        run, schema="image_id string, features array<float>"
    )


def image_near_dup_pairs(
    images: DataFrame,
    max_hamming: int = 3,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """IMAGE-level near-duplicate pairs via the perceptual-hash column:
    the phash is already a 64-bit similarity-preserving fingerprint, so
    the SimHash band machinery applies verbatim — 16-bit quarter-key
    blocking + exact hamming verify, an equi-join, never all-pairs.
    Requires integer ids (hash the id first for string ids)."""
    from batch_geocode_spark.operators.dedup import simhash_band_pairs

    fps = images.select(
        F.col(id_col).alias("doc_id"), F.col(phash_col).alias("simhash")
    )
    out = simhash_band_pairs(fps, max_hamming=max_hamming)
    return out.select(
        F.col("doc_a").alias("image_a"),
        F.col("doc_b").alias("image_b"),
        "hamming",
    )


def decode_audio(df: DataFrame, fmt_col: str = "fmt") -> DataFrame:
    """STUB — audio codecs unavailable in this container. Real signature:
    (id, bytes, fmt) → (id, samples array<float>, sample_rate int) via
    the same mapInPandas shape as validate_images."""
    raise NotImplementedError(
        "audio decode requires a codec library not present in this environment; "
        "the Spark plumbing matches validate_images (mapInPandas over binary)"
    )


def sample_video_frames(df: DataFrame, every_n: int = 30) -> DataFrame:
    """STUB — video codecs unavailable. Real signature: (id, bytes, fmt)
    → exploded (id, frame_no int, frame binary) rows."""
    raise NotImplementedError(
        "video frame sampling requires a codec library not present here; "
        "plumbing = mapInPandas emitting multiple rows per input row"
    )
