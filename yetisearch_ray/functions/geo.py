"""Geo primitives (reference ``src/Geo/GeoPoint.php`` /
``SqliteStorage.php:2128-2256``): haversine distance (R = 6371 km),
bounding boxes with antimeridian splitting, point-in-bounds checks.
Vectorized over numpy arrays — these run as masks inside ``map_batches``
or over candidate arrays in the query engine, never per-row Python."""

from __future__ import annotations

import math

import numpy as np

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1, lng1, lat2, lng2):
    """Great-circle distance in km; scalar or numpy-vectorized."""
    lat1, lng1, lat2, lng2 = (np.radians(np.asarray(x, dtype=np.float64))
                              for x in (lat1, lng1, lat2, lng2))
    dlat = lat2 - lat1
    dlng = lng2 - lng1
    a = np.sin(dlat / 2.0) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlng / 2.0) ** 2
    return EARTH_RADIUS_KM * 2.0 * np.arcsin(np.sqrt(np.clip(a, 0.0, 1.0)))


def bounding_box(lat: float, lng: float, radius_km: float):
    """(min_lat, max_lat, min_lng, max_lng) around a point; the lng span
    widens with latitude.  May extend past ±180 — see ``split_bbox``."""
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    cos_lat = max(1e-9, math.cos(math.radians(lat)))
    dlng = math.degrees(radius_km / (EARTH_RADIUS_KM * cos_lat))
    return (max(-90.0, lat - dlat), min(90.0, lat + dlat),
            lng - dlng, lng + dlng)


def split_bbox(bbox):
    """Split an antimeridian-crossing bbox into 1–2 in-range boxes
    (reference antimeridian handling :2159-2166)."""
    min_lat, max_lat, min_lng, max_lng = bbox
    if min_lng >= -180.0 and max_lng <= 180.0:
        return [bbox]
    boxes = []
    if min_lng < -180.0:
        boxes.append((min_lat, max_lat, min_lng + 360.0, 180.0))
        boxes.append((min_lat, max_lat, -180.0, max_lng))
    elif max_lng > 180.0:
        boxes.append((min_lat, max_lat, min_lng, 180.0))
        boxes.append((min_lat, max_lat, -180.0, max_lng - 360.0))
    return boxes


def in_bounds(lats, lngs, bbox) -> np.ndarray:
    """Vectorized point-in-bbox mask (with antimeridian support)."""
    lats = np.asarray(lats, dtype=np.float64)
    lngs = np.asarray(lngs, dtype=np.float64)
    mask = np.zeros(lats.shape, dtype=bool)
    for (lo_lat, hi_lat, lo_lng, hi_lng) in split_bbox(bbox):
        mask |= ((lats >= lo_lat) & (lats <= hi_lat)
                 & (lngs >= lo_lng) & (lngs <= hi_lng))
    return mask


def near_mask(lats, lngs, center_lat: float, center_lng: float,
              radius_km: float) -> np.ndarray:
    """bbox prefilter + exact haversine radius check (the reference's
    R-tree-prefilter-then-haversine shape :2128-2176)."""
    bbox = bounding_box(center_lat, center_lng, radius_km)
    rough = in_bounds(lats, lngs, bbox)
    out = np.zeros(rough.shape, dtype=bool)
    if rough.any():
        idx = np.flatnonzero(rough)
        d = haversine_km(np.asarray(lats, dtype=np.float64)[idx],
                         np.asarray(lngs, dtype=np.float64)[idx],
                         center_lat, center_lng)
        out[idx] = d <= radius_km
    return out


def distance_blend(text_scores, distances_km, *, weight: float = 0.3,
                   decay: float = 0.05):
    """Blend text relevance with proximity (reference §2.9 step 5):
    ``final = (1-w)·text + w·100·exp(-k·km)``."""
    text_scores = np.asarray(text_scores, dtype=np.float64)
    distances_km = np.asarray(distances_km, dtype=np.float64)
    return (1.0 - weight) * text_scores + weight * 100.0 * np.exp(-decay * distances_km)
