"""Catalog ingestion parsers (reference parity: S6/S8/F5 + the §2.9
user-extension surface).

* ``parse_sigma_inf`` — the reference's ``vdatum_sigma.inf`` format
  (``core.py:915-969``): lines ``region.source.target=value`` with
  values in centimetres; ``navd88.lmsl`` feeds the region's ``tss``
  sigma, ``lmsl.<target>`` the tidal-surface sigmas, ``n/a`` -> 0;
  ``conus.*`` lines carry the geoid sigmas. The inf-file region token
  must be a unique lowercase PREFIX of exactly one catalog region.
* ``read_region_config`` — external-region ``<region>.config`` ini
  (``core.py:972-996``): all sections flattened into one dict.
* ``guess_datum_from_string`` — F5 (``vypercrs.py:950-983``): which
  known datum name appears in a WKT/datum string; '' when none,
  ValueError on an ambiguous match.
* ``register_external_region`` — §2.9/O4: upsert a user region row
  (remove-then-append, ``core.py:755-757``) into a Catalog.
"""

from __future__ import annotations

import configparser
import io

from vyperdatum_ray.core.pipeline_algebra import DATUM_DEFINITION

SIGMA_SURFACES = ("tss", "mhhw", "mhw", "mlw", "mllw", "dtl", "mtl")
GEOID_POSSIBILITIES = (
    "geoid12b", "xgeoid16b", "xgeoid17b", "xgeoid18b", "xgeoid19b", "xgeoid20b",
    # our synthetic catalog's geoids:
    "sgeoid12x", "sxgeoid17b",
)


def parse_sigma_inf(text: str, region_names: list[str]):
    """Parse sigma-inf text; returns (region_sigmas, geoid_sigmas) in
    metres."""
    region_sigmas = {r: dict.fromkeys(SIGMA_SURFACES, 0.0) for r in region_names}
    geoid_sigmas: dict[str, float] = {}
    lowered = [r.lower() for r in region_names]
    for line in text.splitlines():
        parts = line.split("=")
        if len(parts) != 2:
            continue
        entry, raw = parts[0].strip(), parts[1].strip()
        sub = entry.split(".")
        if len(sub) != 3:
            continue
        region, src, target = sub
        value = 0.0 if raw == "n/a" else float(raw) * 0.01
        if region == "conus":
            if src == "navd88" and target == "nad83":
                geoid_sigmas["geoid12b"] = value
            elif src in GEOID_POSSIBILITIES:
                geoid_sigmas[src] = value
            continue
        matches = [i for i, r in enumerate(lowered) if r.startswith(region)]
        if len(matches) > 1:
            raise ValueError(f"multiple region matches for sigma entry {entry!r}")
        if not matches:
            continue
        name = region_names[matches[0]]
        if src == "navd88" and target == "lmsl":
            region_sigmas[name]["tss"] = value
        elif src == "lmsl" and target in SIGMA_SURFACES:
            region_sigmas[name][target] = value
    return region_sigmas, geoid_sigmas


def read_region_config(text: str) -> dict:
    """Flatten every section of an external-region ini into one dict."""
    cp = configparser.ConfigParser()
    cp.read_file(io.StringIO(text))
    settings: dict[str, str] = {}
    for section in cp.sections():
        for key in cp[section]:
            settings[key] = cp[section][key]
    return settings


def guess_datum_from_string(name: str) -> str:
    """Which datum-definition key appears in the string; '' if none,
    ValueError if ambiguous."""
    lowered = name.lower()
    guesses = [d for d in DATUM_DEFINITION if d in lowered]
    # 'noaa chart datum' contains no other key, but 'mllw' in a string
    # like 'mllw depth' is a single hit; multiple distinct hits = error
    if len(guesses) == 1:
        return guesses[0]
    if not guesses:
        return ""
    raise ValueError(f"more than one datum guess found in {name!r}: {guesses}")


def register_external_region(catalog, region_info, grids: dict, sigmas: dict,
                             geoid_sigma: float | None = None):
    """Upsert a user-supplied region (remove-then-append keeps one entry
    per name and puts the new region LAST in catalog order, the
    reference's ensure-once rule). Returns a new Catalog; the input is
    not mutated (catalogs are broadcast values — immutable by design)."""
    from dataclasses import replace

    from vyperdatum_ray.catalog import Catalog, RegionInfo

    regions = [r for r in catalog.regions if r.name != region_info.name]
    regions.append(region_info)
    regions = [replace(r, ord=i) for i, r in enumerate(regions)]
    new_sigmas = {k: dict(v) for k, v in catalog.sigmas.items()}
    new_sigmas[region_info.name] = dict(sigmas)
    new_geoid = dict(catalog.geoid_sigmas)
    if geoid_sigma is not None:
        new_geoid[region_info.geoid_name] = geoid_sigma
    return Catalog(
        regions=regions,
        grids={**catalog.grids, **grids},
        sigmas=new_sigmas,
        geoid_sigmas=new_geoid,
        version=catalog.version + "+ext",
    )


def resolve_band_roles(layer_names: list[str]) -> dict:
    """M9 band-role resolution by case-insensitive name
    (reference raster.py:100-158): elevation = 'depth' | 'elevation' |
    the sole band; uncertainty = 'uncertainty' | 'vertical
    uncertainty'; contributor = 'contributor'. Missing roles map to
    None (downstream treats them as absent, e.g. uncertainty built
    purely from the sep model, raster.py:322-325)."""
    lowered = [n.lower() for n in layer_names]

    if len(lowered) == 1:
        elevation = 0
    elif "depth" in lowered:
        elevation = lowered.index("depth")
    elif "elevation" in lowered:
        elevation = lowered.index("elevation")
    else:
        elevation = None

    if "uncertainty" in lowered:
        uncertainty = lowered.index("uncertainty")
    elif "vertical uncertainty" in lowered:
        uncertainty = lowered.index("vertical uncertainty")
    else:
        uncertainty = None

    contributor = lowered.index("contributor") if "contributor" in lowered else None
    return {"elevation": elevation, "uncertainty": uncertainty,
            "contributor": contributor}
