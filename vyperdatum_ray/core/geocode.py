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


def _extract_on(col, idx: np.ndarray, pattern: str, fields: tuple[str, ...]):
    """Run extract_regex on the ``idx``-selected rows only; returns
    (matched-subset mask, per-field float64 values for the subset, the
    raw StructArray). The caller scatters back by ``idx[mask]``."""
    sub = col.take(pa.array(idx, pa.int64()))
    res = pc.extract_regex(sub, pattern)
    if isinstance(res, pa.ChunkedArray):
        res = res.combine_chunks()
    matched = pc.is_valid(res).to_numpy(zero_copy_only=False)
    out = [pc.cast(res.field(f), pa.float64()).to_numpy(zero_copy_only=False)
           for f in fields]
    return matched, out, res


def geocode_arrays(url, text):
    """Extract (lat, lon, geocode_src) from url/text Arrow arrays.

    Returns float64 numpy lat/lon (NaN where not geocodable) and an
    object-dtype source array ('url_query' | 'url_path' | 'text' | None).

    Bandwidth shape: each capture-group regex runs only on the rows a
    cheap LITERAL substring prefilter selects ('lat=' / '/@' /
    ' N, '|' S, ' — every regex match necessarily contains its literal,
    so the prefilter is lossless). The substring kernels stream bytes at
    memcpy-like speed while RE2 capture extraction is the expensive
    pass, so per-byte cost — the stage that saturated single-box memory
    bandwidth past ~16 cores — drops to the candidate subsets (~27% /
    18% / 15% of rows on the fixture mix)."""
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(url)
    lat = np.full(n, np.nan, dtype=np.float64)
    lon = np.full(n, np.nan, dtype=np.float64)
    src = np.zeros(n, dtype=np.int8)

    cand_q = pc.match_substring(url, "lat=").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(cand_q)
    if len(idx):
        m, (qlat, qlon), _ = _extract_on(url, idx, _URL_QUERY_NAMED, ("lat", "lon"))
        sel = idx[m]
        lat[sel] = qlat[m]
        lon[sel] = qlon[m]
        src[sel] = 1

    cand_p = pc.match_substring(url, "/@").to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(cand_p & (src == 0))
    if len(idx):
        m, (plat, plon), _ = _extract_on(url, idx, _URL_PATH_NAMED, ("lat", "lon"))
        sel = idx[m]
        lat[sel] = plat[m]
        lon[sel] = plon[m]
        src[sel] = 2

    text_nn = pc.coalesce(text, "")
    cand_t = pc.or_(pc.match_substring(text_nn, " N, "),
                    pc.match_substring(text_nn, " S, ")).to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(cand_t & (src == 0))
    if len(idx):
        m, (tlat, tlon), res = _extract_on(text_nn, idx, _TEXT_NAMED, ("lat", "lon"))
        ns = res.field("ns").to_numpy(zero_copy_only=False)
        ew = res.field("ew").to_numpy(zero_copy_only=False)
        sel = idx[m]
        lat[sel] = np.where(ns[m] == "S", -tlat[m], tlat[m])
        lon[sel] = np.where(ew[m] == "W", -tlon[m], tlon[m])
        src[sel] = 3

    src_str = np.array([None, "url_query", "url_path", "text"], dtype=object)[src]
    return lat, lon, src_str
