"""Geocoding: extract lat/lon from web-page ``url`` and ``text`` columns.

The graft operator M10 (SURVEY.md §2.2): the reference has no
equivalent; the north_star mandates "lat/lon parsed from url/text
fields". Three extraction patterns, checked in fixed precedence order:

1. ``url_query`` — ``...?lat=<f>&lon=<f>`` (also ``&lat=...``),
2. ``url_path``  — ``/@<lat>,<lon>`` map-style path segment,
3. ``text``      — ``"<dd.ddd> N, <dd.ddd> W"`` prose coordinates with
   hemisphere letters.

All patterns are RE2-compatible and mirrored verbatim in the DuckDB
oracle SQL (DuckDB's regex engine is also RE2); parsed float64 values
are bit-identical between the Ray pipeline and the oracle because both
use correctly-rounded decimal-string -> double conversion.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Capture-group patterns (RE2). Group names only in the pyarrow variant;
# the SQL oracle uses the same patterns with positional groups.
URL_QUERY_PATTERN = r"[?&]lat=(-?\d+\.\d+)&lon=(-?\d+\.\d+)"
URL_PATH_PATTERN = r"/@(-?\d+\.\d+),(-?\d+\.\d+)"
TEXT_PATTERN = r"(\d+\.\d+) ([NS]), (\d+\.\d+) ([EW])"

_URL_QUERY_NAMED = r"[?&]lat=(?P<lat>-?\d+\.\d+)&lon=(?P<lon>-?\d+\.\d+)"
_URL_PATH_NAMED = r"/@(?P<lat>-?\d+\.\d+),(?P<lon>-?\d+\.\d+)"
_TEXT_NAMED = r"(?P<lat>\d+\.\d+) (?P<ns>[NS]), (?P<lon>\d+\.\d+) (?P<ew>[EW])"


def _extract_floats(col, pattern: str, fields: tuple[str, ...]):
    """Run extract_regex and cast the named groups to float64 numpy
    (NaN where unmatched); also return the match mask."""
    res = pc.extract_regex(col, pattern)
    if isinstance(res, pa.ChunkedArray):
        res = res.combine_chunks()
    matched_arrow = pc.is_valid(res)
    matched = matched_arrow.to_numpy(zero_copy_only=False)
    out = []
    for f in fields:
        raw = pc.if_else(matched_arrow, res.field(f), pa.scalar(None, pa.string()))
        vals = pc.cast(raw, pa.float64()).to_numpy(zero_copy_only=False)
        out.append(vals)
    return matched, out, res


def geocode_arrays(url, text):
    """Extract (lat, lon, geocode_src) from url/text Arrow arrays.

    Returns float64 numpy lat/lon (NaN where not geocodable) and an
    object-dtype source array ('url_query' | 'url_path' | 'text' | None).
    """
    n = len(url)
    lat = np.full(n, np.nan, dtype=np.float64)
    lon = np.full(n, np.nan, dtype=np.float64)
    src = np.zeros(n, dtype=np.int8)

    m, (qlat, qlon), _ = _extract_floats(url, _URL_QUERY_NAMED, ("lat", "lon"))
    lat[m] = qlat[m]
    lon[m] = qlon[m]
    src[m] = 1

    m2, (plat, plon), _ = _extract_floats(url, _URL_PATH_NAMED, ("lat", "lon"))
    m2 &= src == 0
    lat[m2] = plat[m2]
    lon[m2] = plon[m2]
    src[m2] = 2

    m3, (tlat, tlon), res = _extract_floats(text, _TEXT_NAMED, ("lat", "lon"))
    m3 &= src == 0
    if m3.any():
        ns = res.field("ns").to_numpy(zero_copy_only=False)
        ew = res.field("ew").to_numpy(zero_copy_only=False)
        sign_lat = np.where(ns == "S", -1.0, 1.0)
        sign_lon = np.where(ew == "W", -1.0, 1.0)
        lat[m3] = (tlat * sign_lat)[m3]
        lon[m3] = (tlon * sign_lon)[m3]
        src[m3] = 3

    src_str = np.array([None, "url_query", "url_path", "text"], dtype=object)[src]
    return lat, lon, src_str
