"""Compound-CRS metadata: vertical WKT with a provenance REMARK.

The reference documents the exact transform it applied by embedding
``vdatum=...,vyperdatum=...,base_datum=[...],regions=[...],
pipelines=[...]`` in the vertical CRS WKT REMARK (builder
``reference/vyperdatum/vypercrs.py:610-615``, parser ``:403-445``), so
any output file is self-describing and the transform is invertible
later. This module re-expresses that contract from scratch:

* ``VerticalMeta`` — the structured payload (datum, regions in
  catalog order, per-region pipeline strings, catalog fingerprint as
  the version),
* ``build_vertical_wkt`` / ``parse_vertical_wkt`` — a WKT2-shaped
  VERTCRS string with the REMARK, round-trippable,
* ``build_compound_wkt`` — horizontal + vertical compound,
* ``vertical_datum_to_wkt`` — the reference's convenience API
  (``core.py:1150-1206``): datum id + bbox -> WKT with per-region
  pipelines resolved; ``ellipse`` short-circuits without catalog data;
  depth-positive datums (mllw family) get a DOWN axis (the EPSG 5866
  special case, ``core.py:1179-1180``).

The engine stamps the compound WKT into Parquet key-value metadata at
the tile sink (see ``pipelines/raster.py``) and into lineage records.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

ENGINE_NAME = "vyperdatum_ray"
ENGINE_VERSION = "0.1"

# depth-positive-down target datums (reference core.py:1179-1180 maps
# 'mllw' to EPSG 5866, a depth axis)
DEPTH_DATUMS = {"mllw", "noaa chart datum", "mhw", "noaa chart height",
                "mhhw", "mlw", "mtl", "dtl"}


@dataclass
class VerticalMeta:
    datum: str
    regions: list[str] = field(default_factory=list)
    pipelines: list[str] = field(default_factory=list)
    base_datum: list[str] = field(default_factory=list)
    catalog_version: str = "unversioned"
    engine_version: str = ENGINE_VERSION

    def add_pipeline(self, region: str, pipeline: str) -> None:
        if region not in self.regions:
            self.regions.append(region)
            self.pipelines.append(pipeline)

    @property
    def is_depth(self) -> bool:
        return self.datum.lower() in DEPTH_DATUMS

    def remark(self) -> str:
        return (
            f"catalog={self.catalog_version},"
            f"{ENGINE_NAME}={self.engine_version},"
            f"base_datum=[{', '.join(self.base_datum)}],"
            f"regions=[{', '.join(self.regions)}],"
            f"pipelines=[{'; '.join(self.pipelines)}]"
        )


def build_vertical_wkt(meta: VerticalMeta) -> str:
    """VERTCRS WKT string with axis direction by datum sign convention
    and the provenance REMARK."""
    direction, abbrev = ("down", "D") if meta.is_depth else ("up", "H")
    wkt = (
        f'VERTCRS["{meta.datum}",'
        f'VDATUM["{meta.datum}"],'
        f'CS[vertical,1],'
        f'AXIS["gravity-related height ({abbrev})",{direction}],'
        f'LENGTHUNIT["metre",1]'
    )
    if meta.pipelines:
        wkt += f',REMARK["{meta.remark()}"]'
    return wkt + "]"


def parse_vertical_wkt(wkt: str) -> VerticalMeta:
    """Inverse of build_vertical_wkt (tolerates reordered fields)."""
    name = re.search(r'VERTCRS\["([^"]*)"', wkt)
    if not name:
        raise ValueError("not a VERTCRS wkt")
    meta = VerticalMeta(datum=name.group(1))
    remark = re.search(r'REMARK\["([^"]*)"\]', wkt)
    if remark:
        body = remark.group(1)

        def _list(key: str, sep: str) -> list[str]:
            m = re.search(re.escape(key) + r"=\[([^\]]*)\]", body)
            if not m or not m.group(1).strip():
                return []
            return [x.strip() for x in m.group(1).split(sep)]

        def _scalar(key: str) -> str | None:
            m = re.search(re.escape(key) + r"=([^,\[\]]+)", body)
            return m.group(1) if m else None

        meta.regions = _list("regions", ",")
        meta.pipelines = _list("pipelines", ";")
        meta.base_datum = _list("base_datum", ",")
        meta.catalog_version = _scalar("catalog") or "unversioned"
        meta.engine_version = _scalar(ENGINE_NAME) or ENGINE_VERSION
    return meta


def build_compound_wkt(horizontal_wkt: str, vertical_wkt: str) -> str:
    """COMPOUNDCRS wrapping an existing horizontal WKT and our vertical
    WKT (name = '<horiz name> + <vert name>', reference
    vypercrs.py:646-657)."""
    horiz_name = horizontal_wkt.split('"')[1]
    vert_name = vertical_wkt.split('"')[1]
    return (
        f'COMPOUNDCRS["{horiz_name} + {vert_name}",'
        f"{horizontal_wkt},{vertical_wkt}]"
    )


GEOGRAPHIC_WKT = (
    'GEOGCRS["NAD83(2011)",DATUM["NAD83 (National Spatial Reference System 2011)"],'
    'CS[ellipsoidal,2],AXIS["latitude",north],AXIS["longitude",east],'
    'ANGLEUNIT["degree",0.0174532925199433]]'
)


def projected_wkt(kind: str, zone: int) -> str:
    """Minimal PROJCRS WKT for the engine's projected horizontal CRSs
    (UTM north zone number, or a registered SPCS83 LCC zone's EPSG
    code) with the CRS-level ``ID["EPSG",...]`` that ``parse_crs``
    splits on — the same self-describing contract the reference keeps
    via pyproj (vypercrs.py:685-812)."""
    if kind == "utm":
        epsg = 6329 + zone
        name = f"NAD83(2011) / UTM zone {zone}N"
        conv = ('CONVERSION["UTM",METHOD["Transverse Mercator"],'
                f'PARAMETER["Longitude of natural origin",{-183 + 6 * zone}]]')
    elif kind == "lcc":
        from vyperdatum_ray.core.projection import STATE_PLANE_LCC

        epsg = zone
        name = f"NAD83 / SPCS83 {STATE_PLANE_LCC[zone].name}"
        conv = ('CONVERSION["SPCS83",'
                'METHOD["Lambert Conic Conformal (2SP)"]]')
    elif kind == "tm":
        from vyperdatum_ray.core.projection import STATE_PLANE_TM

        epsg = zone
        name = f"NAD83 / SPCS83 {STATE_PLANE_TM[zone].name}"
        conv = ('CONVERSION["SPCS83",'
                'METHOD["Transverse Mercator"]]')
    elif kind == "om":
        from vyperdatum_ray.core.projection import STATE_PLANE_OM

        epsg = zone
        name = f"NAD83 / SPCS83 {STATE_PLANE_OM[zone].name}"
        conv = ('CONVERSION["SPCS83",'
                'METHOD["Hotine Oblique Mercator (variant A)"]]')
    else:
        raise ValueError(f"no projected WKT for kind {kind!r}")
    return (
        f'PROJCRS["{name}",BASEGEOGCRS["NAD83(2011)",'
        f'DATUM["NAD83 (National Spatial Reference System 2011)"]],{conv},'
        f'CS[Cartesian,2],AXIS["easting (X)",east],AXIS["northing (Y)",north],'
        f'LENGTHUNIT["metre",1],ID["EPSG",{epsg}]]'
    )


def _top_level_elements(wkt: str) -> list[str]:
    """Split a WKT node's body into its depth-1 elements (bracket- and
    quote-aware; WKT quotes escape as doubled '""')."""
    start = wkt.index("[") + 1
    body = wkt[start:wkt.rindex("]")]
    out, depth, in_q, cur = [], 0, False, []
    for ch in body:
        if ch == '"':
            in_q = not in_q
        if not in_q:
            if ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
                continue
        cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def split_compound_wkt(wkt: str) -> tuple[str | None, str | None]:
    """COMPOUNDCRS -> (horizontal sub-WKT, vertical sub-WKT) — the
    reference's compound split (vypercrs.py:685-812) without pyproj:
    the depth-1 elements starting with GEOGCRS/PROJCRS and VERTCRS."""
    horiz = vert = None
    for el in _top_level_elements(wkt):
        if el.startswith(("GEOGCRS[", "PROJCRS[", "GEOGCS[", "PROJCS[")):
            horiz = el
        elif el.startswith("VERTCRS["):
            vert = el
    return horiz, vert


def wkt_epsg_id(wkt: str) -> int | None:
    """The CRS-level ``ID["EPSG",n]`` / ``AUTHORITY["EPSG","n"]`` of a
    WKT node (depth-1 only, so conversion/datum sub-ids don't match)."""
    for el in _top_level_elements(wkt):
        m = re.match(r'(?:ID|AUTHORITY)\["EPSG",\s*"?(\d+)"?\]', el)
        if m:
            return int(m.group(1))
    return None


def vertical_datum_to_wkt(
    datum: str,
    bbox: tuple[float, float, float, float],
    catalog=None,
    from_datum: str = "ellipse",
) -> str:
    """Datum id + bbox -> vertical WKT with the per-region pipelines
    that cover the bbox (reference core.py:1150-1206). ``ellipse``
    needs no catalog (core.py:1187-1206)."""
    if datum.lower() == "ellipse":
        return build_vertical_wkt(VerticalMeta(datum="ellipse"))
    if catalog is None:
        raise ValueError(f"datum {datum!r} requires a region catalog")
    from vyperdatum_ray.core.pipeline_algebra import get_regional_pipeline

    meta = VerticalMeta(
        datum=datum,
        catalog_version=catalog.version,
        base_datum=[from_datum],
    )
    for name in catalog.regions_for_bounds(*bbox):
        region = next(r for r in catalog.regions if r.name == name)
        pipeline = get_regional_pipeline(from_datum, datum, name, region.geoid_name)
        meta.add_pipeline(name, pipeline or "noop")
    if not meta.regions:
        raise ValueError(f"no regions intersect bbox {bbox}")
    return build_vertical_wkt(meta)
