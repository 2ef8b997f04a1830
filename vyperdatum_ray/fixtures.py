"""Deterministic synthetic fixtures: the Common-Crawl-style ``pages``
table (BASELINE.json input_hint schema, exact) plus the VDatum-style
region/grid/sigma catalog.

Everything is generated from fixed seeds — no external data — and cached
under ``/tmp/vdr_data/<sf_name>/``. Scale follows the testdata convention
(TESTDATA.md): ``n_pages = 6_000_000 * sf`` (sf0.001 -> 6k rows,
sf0.01 -> 60k, sf0.1 -> 600k).

Page-coordinate population (FIXTURES.md §1): ~60% of rows geocodable,
split across url-query / url-path / text sources; coordinates cluster
around two hot coastal cells (skew!), one cluster sits on the NaN notch
of region B's tss grid (exercising the outside-coverage ``inf`` fallback
to an earlier region, reference core.py:445-453), ~10% of geocodable
rows fall outside every region (region_index = -1 path).

Coordinates are embedded as 5-decimal strings; the engine and the DuckDB
oracle both parse the *same strings*, so float64 parity is automatic.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from vyperdatum_ray.core.geometry import polygon_to_wkb

DATA_ROOT = "/tmp/vdr_data"
FIXTURE_VERSION = 9  # bump to invalidate caches (v9: adds the
#                      stateplane_tm projected-input dataset; v8:
#                      multi-line page text with boilerplate + PII)

AREA = (-77.0, 33.0, -72.0, 38.0)  # lon_min, lat_min, lon_max, lat_max

SURFACES = ("tss", "mllw", "mhw", "mtl", "dtl")
SIGMA_COLS = ("tss", "mhhw", "mhw", "mlw", "mllw", "dtl", "mtl")

# region: (center_lon, center_lat, radius_deg, geoid_name, geoid_frame)
# — the ITRF2014-framed geoid region exercises the real NAD83->ITRF
# Helmert hop (core/helmert.py), as the reference's AK xgeoid17b does
REGION_SPECS = [
    ("SYNcoastA_8301", -75.20, 35.00, 0.85, "sgeoid12x", "NAD83(2011)"),
    ("SYNcoastB_8301", -74.35, 35.65, 0.75, "sgeoid12x", "NAD83(2011)"),
    ("SYNinnerC_8301", -74.90, 36.60, 0.55, "sgeoid12x", "NAD83(2011)"),
    ("SYNdeepD_8301", -73.30, 34.30, 0.65, "sxgeoid17b", "ITRF2014"),
]

# NaN notch in SYNcoastB_8301/tss (inside the A∩B overlap): nodes within
# NOTCH_R of NOTCH_CENTER are nodata.
NOTCH_CENTER = (-74.72, 35.35)
NOTCH_R = 0.10

GRID_MARGIN = 0.25
GRID_N = 56  # nodes per axis for regional grids
GEOID_GRID_N = 96

SIGMA_TABLE = {
    # region: {surface: sigma_m} — distinct values so composed
    # uncertainty is discriminating (FIXTURES.md §4)
    "SYNcoastA_8301": dict(tss=0.012, mhhw=0.019, mhw=0.017, mlw=0.02, mllw=0.031, dtl=0.025, mtl=0.016),
    "SYNcoastB_8301": dict(tss=0.018, mhhw=0.023, mhw=0.021, mlw=0.026, mllw=0.027, dtl=0.029, mtl=0.019),
    "SYNinnerC_8301": dict(tss=0.009, mhhw=0.015, mhw=0.013, mlw=0.017, mllw=0.035, dtl=0.021, mtl=0.012),
    "SYNdeepD_8301": dict(tss=0.022, mhhw=0.027, mhw=0.025, mlw=0.031, mllw=0.024, dtl=0.033, mtl=0.023),
}
GEOID_SIGMAS = {"sgeoid12x": 0.015, "sxgeoid17b": 0.021}


def hexagon(cx: float, cy: float, r: float) -> np.ndarray:
    """CCW pointy-top hexagon vertices (convex — required by the
    half-plane edge table used by the SQL oracle)."""
    ang = np.radians(30.0 + 60.0 * np.arange(6))
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


def sf_name_of(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def n_pages_for(sf_name: str) -> int:
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(1000, int(round(6_000_000 * sf)))


def fixture_dir(sf_dir: str) -> str:
    return os.path.join(DATA_ROOT, sf_name_of(sf_dir))


def ensure_fixtures(sf_dir: str) -> dict:
    """Idempotently generate the fixture set for an sf dir; returns paths.

    Safe to call from several processes: generation goes to a tmp dir
    that is atomically renamed into place.
    """
    out_dir = fixture_dir(sf_dir)
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        if manifest.get("fixture_version") == FIXTURE_VERSION:
            return manifest
    tmp_dir = out_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    sf_name = sf_name_of(sf_dir)
    n = n_pages_for(sf_name)
    _write_catalog(tmp_dir)
    _write_external_region(tmp_dir)
    page_files = _write_pages(tmp_dir, sf_name, n)
    raster_meta = _write_raster(tmp_dir, sf_name)
    manifest = {
        "fixture_version": FIXTURE_VERSION,
        "sf_name": sf_name,
        "n_pages": n,
        "dir": out_dir,
        "pages": [os.path.join(out_dir, "pages", os.path.basename(p)) for p in page_files],
        "catalog_dir": out_dir,
        "raster_meta": raster_meta,
    }
    with open(os.path.join(tmp_dir, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    # atomic publish (another process may have won the race)
    import shutil

    if os.path.exists(out_dir) and not os.path.exists(manifest_path):
        shutil.rmtree(out_dir, ignore_errors=True)  # stale partial dir
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            stale = json.load(f)
        if stale.get("fixture_version") != FIXTURE_VERSION:
            shutil.rmtree(out_dir, ignore_errors=True)
    try:
        os.rename(tmp_dir, out_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)
    with open(manifest_path) as f:
        return json.load(f)


# ------------------------------------------------------------ catalog ---


def _grid_coeffs(rng: np.random.Generator, surface: str):
    """Per-(region, surface) analytic-field coefficients. Magnitudes per
    surface family (geoid ~ tens of meters, tidal surfaces ~ decimeters)."""
    scale = {"geoid": (-33.0, 1.5), "tss": (0.35, 0.18), "mllw": (0.85, 0.25),
             "mhw": (0.85, 0.25), "mtl": (0.45, 0.15), "dtl": (0.40, 0.15)}[surface]
    base = scale[0] + rng.normal(0.0, 0.1 * abs(scale[1]) + 0.02)
    gx = rng.normal(0.0, scale[1] / 3.0)
    gy = rng.normal(0.0, scale[1] / 3.0)
    amp = abs(rng.normal(0.0, scale[1] / 4.0))
    fx = rng.uniform(1.5, 4.0)
    fy = rng.uniform(1.5, 4.0)
    return base, gx, gy, amp, fx, fy


def _grid_field(xs, ys, coeffs, cx, cy):
    base, gx, gy, amp, fx, fy = coeffs
    X, Y = np.meshgrid(xs, ys)  # (ny, nx)
    return base + gx * (X - cx) + gy * (Y - cy) + amp * np.sin(fx * X + fy * Y)


def _write_catalog(out_dir: str) -> None:
    rng = np.random.default_rng(np.random.SeedSequence([42, 7001]))

    cat_rows = []
    edge_rows = []
    meta_rows = []
    val_key, val_ix, val_iy, val_v = [], [], [], []

    def add_grid(grid_key, x0, y0, x1, y1, nnode, coeffs, cx, cy, notch=None):
        dx = (x1 - x0) / (nnode - 1)
        dy = (y1 - y0) / (nnode - 1)
        xs = x0 + dx * np.arange(nnode)
        ys = y0 + dy * np.arange(nnode)
        vals = _grid_field(xs, ys, coeffs, cx, cy)
        if notch is not None:
            ncx, ncy, nr = notch
            X, Y = np.meshgrid(xs, ys)
            vals = np.where((X - ncx) ** 2 + (Y - ncy) ** 2 <= nr * nr, np.nan, vals)
        meta_rows.append(
            dict(grid_key=grid_key, origin_x=x0, origin_y=y0, dx=dx, dy=dy,
                 nx=nnode, ny=nnode)
        )
        iy, ix = np.nonzero(~np.isnan(vals))
        val_key.extend([grid_key] * len(ix))
        val_ix.append(ix.astype(np.int32))
        val_iy.append(iy.astype(np.int32))
        val_v.append(vals[iy, ix])

    for ordinal, (name, cx, cy, r, geoid, frame) in enumerate(REGION_SPECS):
        verts = hexagon(cx, cy, r)
        cat_rows.append(
            dict(region=name, region_ord=ordinal, geoid_name=geoid, geoid_frame=frame,
                 min_x=verts[:, 0].min(), min_y=verts[:, 1].min(),
                 max_x=verts[:, 0].max(), max_y=verts[:, 1].max(),
                 polygon_wkb=polygon_to_wkb(verts))
        )
        # half-plane edge table: inside <=> ax*lon + ay*lat <= b for ALL
        # edges (CCW winding; SQL oracle support for convex regions)
        closed = np.vstack([verts, verts[:1]])
        for e in range(6):
            (px0, py0), (px1, py1) = closed[e], closed[e + 1]
            ax = py1 - py0
            ay = -(px1 - px0)
            b = ax * px0 + ay * py0
            edge_rows.append(dict(region=name, region_ord=ordinal, edge_ord=e,
                                  ax=ax, ay=ay, b=b))
        x0, y0 = verts[:, 0].min() - GRID_MARGIN, verts[:, 1].min() - GRID_MARGIN
        x1, y1 = verts[:, 0].max() + GRID_MARGIN, verts[:, 1].max() + GRID_MARGIN
        for surface in SURFACES:
            coeffs = _grid_coeffs(rng, surface)
            notch = None
            if name == "SYNcoastB_8301" and surface == "tss":
                notch = (*NOTCH_CENTER, NOTCH_R)
            add_grid(f"{name}/{surface}", x0, y0, x1, y1, GRID_N, coeffs, cx, cy, notch)

    for geoid in sorted({spec[4] for spec in REGION_SPECS}):
        coeffs = _grid_coeffs(rng, "geoid")
        add_grid(geoid, AREA[0], AREA[1], AREA[2], AREA[3], GEOID_GRID_N,
                 coeffs, (AREA[0] + AREA[2]) / 2, (AREA[1] + AREA[3]) / 2)

    pq.write_table(pa.Table.from_pylist(cat_rows), os.path.join(out_dir, "region_catalog.parquet"))
    pq.write_table(pa.Table.from_pylist(edge_rows), os.path.join(out_dir, "region_edges.parquet"))
    pq.write_table(pa.Table.from_pylist(meta_rows), os.path.join(out_dir, "grid_meta.parquet"))
    pq.write_table(
        pa.table(
            {
                "grid_key": pa.array(val_key, pa.string()),
                "ix": np.concatenate(val_ix),
                "iy": np.concatenate(val_iy),
                "v": np.concatenate(val_v),
            }
        ),
        os.path.join(out_dir, "grid_values.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [dict(region=k, **{c: v[c] for c in SIGMA_COLS}) for k, v in SIGMA_TABLE.items()]
        ),
        os.path.join(out_dir, "sigma.parquet"),
    )
    pq.write_table(
        pa.Table.from_pylist(
            [dict(geoid_name=k, sigma=v) for k, v in sorted(GEOID_SIGMAS.items())]
        ),
        os.path.join(out_dir, "sigma_geoid.parquet"),
    )


# ---------------------------------------------------- external region ---

# User-supplied region (SURVEY §2.9 / reference core.py:671-764): a
# convex polygon OVERLAPPING SYNcoastA so the appended-last
# catalog-order overwrite is exercised end-to-end. Reuses the base
# sgeoid12x geoid; its own tss/tidal grids and sigma row. region_ord is
# written as len(REGION_SPECS) — exactly the ordinal
# register_external_region assigns when appending to the base catalog.
EXT_REGION = ("EXTuser_9901", -75.55, 34.75, 0.55, "sgeoid12x", "NAD83(2011)")
EXT_SIGMA = dict(tss=0.014, mhhw=0.02, mhw=0.018, mlw=0.022, mllw=0.028,
                 dtl=0.026, mtl=0.015)


def _write_external_region(out_dir: str) -> None:
    """Catalog-as-data external region under ``external/``: the same
    five parquet schemas as the base catalog, so the engine ingests it
    with ``Catalog.from_dir`` + ``register_external_region`` and the
    SQL oracle UNIONs the tables."""
    ext_dir = os.path.join(out_dir, "external")
    os.makedirs(ext_dir, exist_ok=True)
    rng = np.random.default_rng(np.random.SeedSequence([42, 9901]))
    name, cx, cy, r, geoid, frame = EXT_REGION
    ordinal = len(REGION_SPECS)
    verts = hexagon(cx, cy, r)
    cat_rows = [dict(region=name, region_ord=ordinal, geoid_name=geoid,
                     geoid_frame=frame,
                     min_x=verts[:, 0].min(), min_y=verts[:, 1].min(),
                     max_x=verts[:, 0].max(), max_y=verts[:, 1].max(),
                     polygon_wkb=polygon_to_wkb(verts))]
    edge_rows = []
    closed = np.vstack([verts, verts[:1]])
    for e in range(6):
        (px0, py0), (px1, py1) = closed[e], closed[e + 1]
        ax = py1 - py0
        ay = -(px1 - px0)
        edge_rows.append(dict(region=name, region_ord=ordinal, edge_ord=e,
                              ax=ax, ay=ay, b=ax * px0 + ay * py0))
    meta_rows = []
    val_key, val_ix, val_iy, val_v = [], [], [], []
    x0g, y0g = verts[:, 0].min() - GRID_MARGIN, verts[:, 1].min() - GRID_MARGIN
    x1g, y1g = verts[:, 0].max() + GRID_MARGIN, verts[:, 1].max() + GRID_MARGIN
    for surface in SURFACES:
        coeffs = _grid_coeffs(rng, surface)
        dx = (x1g - x0g) / (GRID_N - 1)
        dy = (y1g - y0g) / (GRID_N - 1)
        xs = x0g + dx * np.arange(GRID_N)
        ys = y0g + dy * np.arange(GRID_N)
        vals = _grid_field(xs, ys, coeffs, cx, cy)
        meta_rows.append(dict(grid_key=f"{name}/{surface}", origin_x=x0g,
                              origin_y=y0g, dx=dx, dy=dy, nx=GRID_N, ny=GRID_N))
        iy, ix = np.nonzero(~np.isnan(vals))
        val_key.extend([f"{name}/{surface}"] * len(ix))
        val_ix.append(ix.astype(np.int32))
        val_iy.append(iy.astype(np.int32))
        val_v.append(vals[iy, ix])
    pq.write_table(pa.Table.from_pylist(cat_rows),
                   os.path.join(ext_dir, "region_catalog.parquet"))
    pq.write_table(pa.Table.from_pylist(edge_rows),
                   os.path.join(ext_dir, "region_edges.parquet"))
    pq.write_table(pa.Table.from_pylist(meta_rows),
                   os.path.join(ext_dir, "grid_meta.parquet"))
    pq.write_table(
        pa.table({"grid_key": pa.array(val_key, pa.string()),
                  "ix": np.concatenate(val_ix), "iy": np.concatenate(val_iy),
                  "v": np.concatenate(val_v)}),
        os.path.join(ext_dir, "grid_values.parquet"))
    pq.write_table(pa.Table.from_pylist([dict(region=name, **EXT_SIGMA)]),
                   os.path.join(ext_dir, "sigma.parquet"))
    pq.write_table(
        pa.Table.from_pylist([dict(geoid_name=geoid, sigma=GEOID_SIGMAS[geoid])]),
        os.path.join(ext_dir, "sigma_geoid.parquet"))


# ------------------------------------------------------------- raster ---

# Raster extent: overlaps regions A, B and D (C lies fully north of it)
# and contains the B/tss NaN notch plus open water outside every region.
RASTER_EXTENT = (-75.7, 34.35, -73.7, 35.95)  # x0, y0, x1, y1
RASTER_TILE = 128  # tile side (cells) for the per-tile parquet output


def raster_cells_for(sf_name: str) -> int:
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(2304, int(round(2_400_000 * sf)))


def _write_raster(out_dir: str, sf_name: str) -> dict:
    """Long-form synthetic raster (S1 stand-in): one row per cell with
    (row, col, elevation, uncertainty, contributor); cell-center coords
    are ``origin + (index + 0.5) * d``. Elevation is an analytic height
    field (metres, ellipsoid) with a deterministic ~2% nodata speckle;
    the source-uncertainty band is strictly positive; contributor is a
    small integer id. Metadata goes to raster_meta.{json,parquet}."""
    x0, y0, x1, y1 = RASTER_EXTENT
    side = int(round(raster_cells_for(sf_name) ** 0.5))
    ncols = nrows = side
    dx = (x1 - x0) / ncols
    dy = (y1 - y0) / nrows

    col, row = np.meshgrid(np.arange(ncols, dtype=np.int32), np.arange(nrows, dtype=np.int32))
    col = col.ravel()
    row = row.ravel()
    lon = x0 + (col.astype(np.float64) + 0.5) * dx
    lat = y0 + (row.astype(np.float64) + 0.5) * dy

    elev = (
        -20.0
        + 8.0 * np.sin(3.0 * lon)
        + 6.0 * np.cos(2.5 * lat)
        + 1.5 * np.sin(11.0 * lon + 7.0 * lat)
    )
    speckle = (row.astype(np.int64) * 73856093 + col.astype(np.int64) * 19349663) % 47 == 0
    elev = np.where(speckle, np.nan, np.round(elev, 3))
    unc = np.round(0.10 + 0.05 * np.abs(np.sin(2.0 * lon) * np.cos(3.0 * lat)), 3)
    contrib = ((row.astype(np.int64) * ncols + col.astype(np.int64)) % 7).astype(np.float64)

    pq.write_table(
        pa.table(
            {
                "row": pa.array(row, pa.int32()),
                "col": pa.array(col, pa.int32()),
                "elevation": pa.array(elev, pa.float64()),
                "uncertainty": pa.array(unc, pa.float64()),
                "contributor": pa.array(contrib, pa.float64()),
            }
        ),
        os.path.join(out_dir, "raster_cells.parquet"),
        row_group_size=65536,
    )
    meta = dict(
        origin_x=x0, origin_y=y0, dx=dx, dy=dy, ncols=ncols, nrows=nrows,
        tile=RASTER_TILE, in_is_height=True, out_is_height=False,
    )
    with open(os.path.join(out_dir, "raster_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    pq.write_table(pa.Table.from_pylist([meta]), os.path.join(out_dir, "raster_meta.parquet"))
    return meta


# -------------------------------------------------------------- pages ---


def _sample_coords(rng: np.random.Generator, n: int):
    """Skewed coordinate population: hot coastal clusters + uniform +
    notch cluster + far-outside band."""
    kinds = rng.choice(5, size=n, p=[0.40, 0.17, 0.10, 0.08, 0.25])
    lon = np.empty(n)
    lat = np.empty(n)
    specs = {
        0: ("gauss", -75.10, 35.05, 0.09),   # hot cell in region A
        1: ("gauss", -74.45, 35.70, 0.07),   # hot cell in region B
        2: ("gauss", -74.90, 36.60, 0.15),   # region C
        3: ("gauss", NOTCH_CENTER[0], NOTCH_CENTER[1], 0.035),  # NaN-notch cluster
    }
    for k, (kind, cx, cy, s) in specs.items():
        m = kinds == k
        lon[m] = rng.normal(cx, s, m.sum())
        lat[m] = rng.normal(cy, s, m.sum())
    m = kinds == 4  # uniform: area-wide incl. a far-outside band
    lon[m] = rng.uniform(-76.4, -71.6, m.sum())
    lat[m] = rng.uniform(33.6, 37.4, m.sum())
    return np.round(lon, 5), np.round(lat, 5)


def _write_pages(out_dir: str, sf_name: str, n: int) -> list[str]:
    pages_dir = os.path.join(out_dir, "pages")
    os.makedirs(pages_dir, exist_ok=True)
    rng = np.random.default_rng(np.random.SeedSequence([42, 5001, n]))

    idx = np.arange(n, dtype=np.int64)
    # geocode source: 0 none (40%), 1 url_query (27%), 2 url_path (18%), 3 text (15%)
    src = rng.choice(4, size=n, p=[0.40, 0.27, 0.18, 0.15])
    lon, lat = _sample_coords(rng, n)

    host = idx % 97
    langs = np.array(["en", "es", "de", "fr"], dtype=object)[idx % 4]
    ts = (np.int64(1704067200_000_000) + idx * 1_000_000).view("datetime64[us]")

    url = np.empty(n, dtype=object)
    text = np.empty(n, dtype=object)
    html = np.empty(n, dtype=object)
    fillers = np.array(
        ["tidal datums", "coastal survey", "hydrographic chart", "web crawl record",
         "bathymetry notes", "navigation aids"], dtype=object,
    )[idx % 6]
    # Multi-line page bodies (v8): line 1 keeps the original geocodable
    # sentence byte-for-byte (the geocode regexes and their literal
    # prefilters see exactly what they saw before); appended lines give
    # the webtext ops real structure — a fake PII contact line on every
    # 8th page (RFC 2606 example domains, 555-01xx phones, 192.0.2.x
    # TEST-NET addresses) and one line from a small boilerplate pool so
    # C4-style corpus line dedup has genuinely hot lines. Kept short on
    # purpose: page bytes set the flagship's memory-bandwidth footprint
    # (BASELINE.md scaling notes). None of the added lines can trip the
    # geocode patterns: no 'lat=', no '/@', no '<f> N, <f> W' shape.
    boilerplate = [
        "Subscribe for weekly updates.",
        "This site stores cookies.",
        "All rights reserved.",
        "Data provided as-is.",
        "Follow the expedition online.",
        "Sign in to download data.",
        "Generated from archive holdings.",
        "See the tidal datum glossary.",
    ]
    for i in range(n):
        h = host[i]
        if src[i] == 1:
            url[i] = f"https://host{h}.example/p/{i}?lat={lat[i]:.5f}&lon={lon[i]:.5f}"
            first = f"Document {i} concerning {fillers[i]} and shoreline change."
        elif src[i] == 2:
            url[i] = f"https://host{h}.example/map/@{lat[i]:.5f},{lon[i]:.5f}/view"
            first = f"Document {i} concerning {fillers[i]} and shoreline change."
        elif src[i] == 3:
            url[i] = f"https://host{h}.example/p/{i}"
            first = (
                f"Site survey at {lat[i]:.5f} N, {abs(lon[i]):.5f} W "
                f"covering {fillers[i]} for record {i}."
            )
        else:
            url[i] = f"https://host{h}.example/p/{i}"
            first = f"Document {i} concerning {fillers[i]} without coordinates."
        lines = [first]
        if i % 8 == 5:
            lines.append(
                f"Contact curator{i % 50}@archive{h:02d}.example or call "
                f"555-01{i % 100:02d}, mirror node 192.0.2.{i % 254}."
            )
        lines.append(boilerplate[i % 8])
        text[i] = "\n".join(lines)
        html[i] = (f"<html><body><h1>doc {i}</h1><p>{fillers[i]}</p></body></html>").encode()

    table = pa.table(
        {
            "url": pa.array(url, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(html, pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    rows_per_shard = 25_000
    nshards = max(1, (n + rows_per_shard - 1) // rows_per_shard)
    paths = []
    for s in range(nshards):
        sl = table.slice(s * rows_per_shard, rows_per_shard)
        p = os.path.join(pages_dir, f"part-{s:04d}.parquet")
        pq.write_table(sl, p)
        paths.append(p)
    _write_stateplane(out_dir, url, lon, lat, src, rows_per_shard)
    _write_stateplane_tm(out_dir, url, lon, lat, src, rows_per_shard)
    return paths


def _write_stateplane(out_dir: str, url, lon, lat, src, rows_per_shard: int):
    """State-plane INPUT dataset (the reference's stateplane golden
    shape, tests/test_core.py:130-154): the geocodable pages' points
    forward-projected ONCE into NC SPCS83 (EPSG:3631, the zone the
    fixture area sits in) and stored as parquet — engine and oracle
    both read these exact doubles, so the projected input is
    bit-identical on both sides by construction (the forward kernel is
    golden-validated in tests; only the inverse runs inside queries)."""
    from vyperdatum_ray.core.projection import lcc_forward

    sp_dir = os.path.join(out_dir, "stateplane")
    os.makedirs(sp_dir, exist_ok=True)
    m = src != 0
    e, nn = lcc_forward(lon[m], lat[m], 3631)
    t = pa.table({
        "url": pa.array(url[m], pa.string()),
        "easting": pa.array(e, pa.float64()),
        "northing": pa.array(nn, pa.float64()),
    })
    for s in range(max(1, (t.num_rows + rows_per_shard - 1) // rows_per_shard)):
        pq.write_table(t.slice(s * rows_per_shard, rows_per_shard),
                       os.path.join(sp_dir, f"part-{s:04d}.parquet"))


def _write_stateplane_tm(out_dir: str, url, lon, lat, src, rows_per_shard: int):
    """Transverse-Mercator state-plane INPUT dataset: the geocodable
    pages' points forward-projected ONCE into SPCS83 Delaware
    (EPSG:26957, the TM zone whose central meridian band covers the
    fixture area) and stored as parquet — same bit-identical-doubles
    contract as the LCC sibling above (only the inverse runs inside
    queries / the SQL oracle)."""
    from vyperdatum_ray.core.projection import tm_forward

    sp_dir = os.path.join(out_dir, "stateplane_tm")
    os.makedirs(sp_dir, exist_ok=True)
    m = src != 0
    e, nn = tm_forward(lon[m], lat[m], 26957)
    t = pa.table({
        "url": pa.array(url[m], pa.string()),
        "easting": pa.array(e, pa.float64()),
        "northing": pa.array(nn, pa.float64()),
    })
    for s in range(max(1, (t.num_rows + rows_per_shard - 1) // rows_per_shard)):
        pq.write_table(t.slice(s * rows_per_shard, rows_per_shard),
                       os.path.join(sp_dir, f"part-{s:04d}.parquet"))


def pages_paths(sf_dir: str) -> list[str]:
    return ensure_fixtures(sf_dir)["pages"]


def stateplane_dir(sf_dir: str) -> str:
    ensure_fixtures(sf_dir)
    return os.path.join(fixture_dir(sf_dir), "stateplane")


def stateplane_tm_dir(sf_dir: str) -> str:
    ensure_fixtures(sf_dir)
    return os.path.join(fixture_dir(sf_dir), "stateplane_tm")


def catalog_dir(sf_dir: str) -> str:
    return ensure_fixtures(sf_dir)["catalog_dir"]


IMAGE_FIXTURE_VERSION = 1


def ensure_image_fixtures(sf_dir: str) -> str:
    """Deterministic synthetic image table for the multimodal near-dup
    path: ``images.parquet`` (img_id int64, payload binary P6 PPM).
    Images come in groups — one base pattern plus noisy near-duplicate
    copies (a few per-pixel perturbations + a small brightness shift,
    the register a perceptual hash must be invariant to) — plus
    singletons. Independent of the page fixtures (own version marker)
    so adding it never invalidates goldens."""
    root = os.path.join(fixture_dir(sf_dir), "images", f"v{IMAGE_FIXTURE_VERSION}")
    path = os.path.join(root, "images.parquet")
    if os.path.exists(path):
        return path
    ensure_fixtures(sf_dir)  # parent dir + deterministic scale
    n_groups = max(24, n_pages_for(sf_name_of(sf_dir)) // 2500)
    rng = np.random.default_rng(20240817)
    W, H = 32, 24
    ids, payloads = [], []
    img_id = 0
    for g in range(n_groups):
        # base pattern: random blocky mosaic (high gradient entropy, so
        # distinct groups land far apart in dHash space; smooth
        # gradients measured as low as hamming 0 across groups)
        blocks = rng.uniform(0, 255, (H // 4, W // 4, 3))
        base = np.kron(blocks, np.ones((4, 4, 1)))
        n_copies = 1 if g % 5 == 4 else int(rng.integers(2, 5))
        for _c in range(n_copies):
            img = base.copy()
            if _c > 0:  # noisy near-duplicate
                img += rng.uniform(-3, 3)  # brightness shift
                n_px = int(0.03 * W * H)
                py = rng.integers(0, H, n_px)
                px = rng.integers(0, W, n_px)
                img[py, px] += rng.uniform(-20, 20, (n_px, 1))
            u8 = np.clip(img, 0, 255).astype(np.uint8)
            payloads.append(b"P6\n%d %d\n255\n" % (W, H) + u8.tobytes())
            ids.append(img_id)
            img_id += 1
    # columns: img_id, payload only (ground truth stays derivable from
    # the generator, not leaked into the table)
    t = pa.table({"img_id": pa.array(ids, pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    tmp = path + f".tmp.{os.getpid()}"
    os.makedirs(root, exist_ok=True)
    pq.write_table(t, tmp)
    os.replace(tmp, path)
    return path
