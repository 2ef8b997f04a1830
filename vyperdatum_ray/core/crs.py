"""Input-CRS parsing and splitting — the user-facing slice of the
reference's VyperCRS handling (``reference/vyperdatum/vypercrs.py:685-812``,
``core.py:198-248``): accept an EPSG code / "EPSG:nnnn" string /
(horizontal, vertical) tuple, split it into a horizontal part the
engine can handle (geographic NAD83 or a UTM zone it inverse-projects
with core/projection.py) and a vertical datum name, and REJECT anything
else loudly instead of silently assuming geographic NAD83 (round 1's
behavior)."""

from __future__ import annotations

from dataclasses import dataclass

# geographic NAD83(2011) family: 2-D, 3-D, and the legacy NAD83 codes
_GEOGRAPHIC_NAD83 = {6318, 6319, 4269, 4959}

# NAD83(2011) UTM north zones (EPSG:6330+zone = zone 1N ... 6339 = 10N,
# 26901-26923 are the NAD83 originals); both map to zone numbers
_UTM_NAD83_2011 = {6329 + z: z for z in range(1, 24)}
_UTM_NAD83 = {26900 + z: z for z in range(1, 24)}

_VERTICAL_NAMES = {
    "ellipse", "geoid", "navd88", "tss", "mllw", "mhw", "mtl", "dtl",
    "noaa chart datum", "noaa chart height", "lwrp2007", "hrd",
}


@dataclass(frozen=True)
class CRSInfo:
    kind: str  # 'geographic' | 'utm' | 'lcc'
    zone: int | None  # UTM zone number, or state-plane EPSG when 'lcc'
    vertical: str  # vertical datum name ('ellipse' when unspecified)


def _parse_horizontal(code: int) -> CRSInfo:
    from vyperdatum_ray.core.projection import (STATE_PLANE_LCC,
                                                STATE_PLANE_OM,
                                                STATE_PLANE_TM)

    if code in _GEOGRAPHIC_NAD83:
        return CRSInfo(kind="geographic", zone=None, vertical="ellipse")
    zone = _UTM_NAD83_2011.get(code) or _UTM_NAD83.get(code)
    if zone:
        return CRSInfo(kind="utm", zone=zone, vertical="ellipse")
    if code in STATE_PLANE_LCC:  # SPCS83 LCC zones (reference goldens)
        return CRSInfo(kind="lcc", zone=code, vertical="ellipse")
    if code in STATE_PLANE_TM:  # SPCS83 TM zones (DE + AK 2-9)
        return CRSInfo(kind="tm", zone=code, vertical="ellipse")
    if code in STATE_PLANE_OM:  # SPCS83 AK zone 1 (Hotine OM)
        return CRSInfo(kind="om", zone=code, vertical="ellipse")
    raise ValueError(
        f"unsupported horizontal CRS EPSG:{code} — this engine accepts "
        f"geographic NAD83 ({sorted(_GEOGRAPHIC_NAD83)}), NAD83 UTM "
        f"north zones (EPSG:6330+zone / 26900+zone), and the registered "
        f"SPCS83 Lambert ({sorted(STATE_PLANE_LCC)}), transverse-"
        f"Mercator ({sorted(STATE_PLANE_TM)}) and oblique-Mercator "
        f"({sorted(STATE_PLANE_OM)}) zones; other state-plane zones "
        f"and non-NAD83 frames are not implemented"
    )


def _parse_wkt(wkt: str) -> CRSInfo:
    """WKT-string input CRS — the reference accepts a full (possibly
    compound) WKT and splits it before transforming
    (``reference/vyperdatum/vypercrs.py:685-812``, exercised by
    ``raster.py:60-98`` initialize-from-GeoTIFF-WKT). Compound WKTs
    split into horizontal (GEOGCRS -> geographic NAD83; PROJCRS -> by
    CRS-level EPSG id) + vertical (VERTCRS name via parse_vertical_wkt);
    bare GEOGCRS/PROJCRS/VERTCRS strings are each accepted alone."""
    from vyperdatum_ray.core.wkt import (parse_vertical_wkt,
                                         split_compound_wkt, wkt_epsg_id)

    wkt = wkt.strip()
    horiz_wkt, vert_wkt = ((wkt, None) if not wkt.startswith("COMPOUNDCRS[")
                           else split_compound_wkt(wkt))
    if horiz_wkt is not None and horiz_wkt.startswith("VERTCRS["):
        horiz_wkt, vert_wkt = None, horiz_wkt
    vertical = "ellipse"
    if vert_wkt is not None:
        name = parse_vertical_wkt(vert_wkt).datum.lower()
        if name not in _VERTICAL_NAMES:
            raise ValueError(f"unknown vertical datum in WKT: {name!r}")
        vertical = name
    if horiz_wkt is None:
        h = CRSInfo(kind="geographic", zone=None, vertical="ellipse")
    elif horiz_wkt.startswith(("GEOGCRS[", "GEOGCS[")):
        if "NAD83" not in horiz_wkt.split(",")[0]:
            raise ValueError(
                f"unsupported geographic WKT datum (need NAD83): "
                f"{horiz_wkt.split(',')[0]!r}")
        h = CRSInfo(kind="geographic", zone=None, vertical="ellipse")
    else:  # PROJCRS: resolve by the CRS-level EPSG id
        epsg = wkt_epsg_id(horiz_wkt)
        if epsg is None:
            raise ValueError(
                "projected WKT needs a CRS-level ID[\"EPSG\",n] / "
                "AUTHORITY to resolve the zone")
        h = _parse_horizontal(epsg)
    return CRSInfo(kind=h.kind, zone=h.zone, vertical=vertical)


def parse_crs(spec) -> CRSInfo:
    """Parse an input-CRS spec into (horizontal kind, zone, vertical).

    Accepts: int EPSG code, 'EPSG:nnnn', a bare vertical datum name
    ('mllw', 'navd88', ...; horizontal defaults to geographic NAD83 as
    in the reference's string pathway), a WKT string (GEOGCRS / PROJCRS
    / VERTCRS / COMPOUNDCRS — the reference's split semantics,
    vypercrs.py:685-812), or a (horizontal, vertical) tuple. Anything
    else raises ValueError."""
    if isinstance(spec, tuple):
        if len(spec) != 2:
            raise ValueError(f"CRS tuple must be (horizontal, vertical): {spec!r}")
        h = parse_crs(spec[0])
        v = spec[1]
        if not isinstance(v, str) or v.lower() not in _VERTICAL_NAMES:
            raise ValueError(f"unknown vertical datum {v!r}")
        return CRSInfo(kind=h.kind, zone=h.zone, vertical=v.lower())
    if isinstance(spec, int):
        return _parse_horizontal(spec)
    if isinstance(spec, str):
        s = spec.strip()
        if s.upper().startswith("EPSG:"):
            return _parse_horizontal(int(s[5:]))
        if s.startswith(("COMPOUNDCRS[", "GEOGCRS[", "GEOGCS[", "PROJCRS[",
                         "PROJCS[", "VERTCRS[")):
            return _parse_wkt(s)
        if s.lower() in _VERTICAL_NAMES:
            return CRSInfo(kind="geographic", zone=None, vertical=s.lower())
        raise ValueError(
            f"unsupported CRS spec {spec!r} (want an EPSG code, 'EPSG:nnnn', "
            f"a vertical datum name, or a (horizontal, vertical) tuple)"
        )
    raise ValueError(f"unsupported CRS spec type {type(spec).__name__}")
