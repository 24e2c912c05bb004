"""Pandas reference oracle — a literal reimplementation of the
reference's pure vetting math, used ONLY in tests to certify the Spark
engine's parity row-for-row.

Mirrors, step by step:
- points_list construction per candidate (bbox corners vs single point)
  reference: geocode/query_funcs.py:376-394, 424-439, 452-469, 485-506
- centroid = mean over points, bbox = min/max, buffer = haversine diag
  reference: geocode/query_funcs.py:254-278 (earth radius 6371.0088 km)
- top-n per source, buffer vet, composite 'best'
  reference: geocode/query_funcs.py:144, 193-219
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from batch_geocode_spark.functions.geo import np_haversine_km


def _points_for(row) -> list[tuple[float, float]]:
    if row.bb_w is not None and not (isinstance(row.bb_w, float) and np.isnan(row.bb_w)):
        return [(row.bb_e, row.bb_n), (row.bb_w, row.bb_s)]
    return [(row.lng, row.lat)]


def _diag_km(pts) -> float:
    lngs = [p[0] for p in pts]
    lats = [p[1] for p in pts]
    return float(np_haversine_km(min(lats), min(lngs), max(lats), max(lngs)))


def geocode_oracle(
    images: pd.DataFrame,
    gazetteer: pd.DataFrame,
    extract_key,
    n_results: int = 2,
    max_buffer: float = 15.0,
) -> pd.DataFrame:
    """Per image_id: the reference's best-composite output (or no row)."""
    gaz_by_name: dict[str, pd.DataFrame] = {
        k: g.sort_values(["api_rank", "gaz_id"]) for k, g in gazetteer.groupby("name_norm")
    }
    out = []
    for img in images.itertuples():
        key = extract_key(img.caption)
        if key is None or key not in gaz_by_name:
            continue
        g = gaz_by_name[key]
        combined: list[tuple[float, float]] = []
        num_valid = 0
        for _, src_rows in g.groupby("source", sort=True):
            for row in src_rows.head(n_results).itertuples():
                pts = _points_for(row)
                if _diag_km(pts) <= max_buffer:
                    combined += pts
                    num_valid += 1
        if not combined:
            continue
        diag = _diag_km(combined)
        if diag > max_buffer:
            continue
        out.append(
            dict(
                image_id=img.image_id,
                best_name="Vetted",
                best_type=f"Composite of {num_valid} geocoded locations",
                best_lat=float(np.mean([p[1] for p in combined])),
                best_long=float(np.mean([p[0] for p in combined])),
                best_buffer=diag,
                num_valid=num_valid,
            )
        )
    return pd.DataFrame(out)


def extract_key_default(caption: str) -> str | None:
    """Matches operators.geocode.extract_loc_key's regexp semantics."""
    import re

    m = re.search(r"\bnear ([^,]+)", caption)
    if not m:
        return None
    return re.sub(r"\s+", " ", m.group(1).strip().lower())
