"""Datum-definition algebra: compose, invert and reduce vertical-datum
pipelines.

Semantics re-expressed from the reference's pipeline module
(``reference/vyperdatum/pipeline.py:20-168``): every datum is defined as a
list of grid-shift steps *down from the ellipsoid*; the pipeline between
two datums is ``inverse(from_def reduced) + (to_def reduced)`` where
``reduced`` removes the common prefix of the two definitions
(``pipeline.py:116-142``).

Step convention (matches PROJ ``vgridshift`` as used by the reference):

* forward step ``vgridshift grids=G``:  ``z_out = z - G(lon, lat)``
  (e.g. ellipsoid height -> orthometric height subtracts the geoid
  undulation),
* inverse step ``+inv vgridshift grids=G``: ``z_out = z + G(lon, lat)``.

The reference encodes exactly this in its raster path, where the regional
separation is the sum of ``-grid`` for forward steps and ``+grid`` for
``+inv`` steps (``reference/vyperdatum/raster.py:253-285``).

Pipelines are plain strings ``'+proj=pipeline +step ... +step ...'`` with
``REGION``/``GEOID`` placeholders substituted per region, identical in
shape to the reference so its tests translate directly.
"""

from __future__ import annotations

from dataclasses import dataclass

# The datum definition database. Keys are datum names; values are the
# grid-shift steps that take an ellipsoid height *down to* that datum.
# Shape mirrors reference/vyperdatum/pipeline.py:20-48 (it IS the spec);
# grid paths use forward slashes (our grids are catalog keys, not files).
DATUM_DEFINITION: dict[str, list[str]] = {
    "ellipse": [],
    "geoid": ["+proj=vgridshift grids=GEOID"],
    "navd88": ["+proj=vgridshift grids=GEOID"],
    "tss": [
        "+proj=vgridshift grids=GEOID",
        "+inv +proj=vgridshift grids=REGION/tss",
    ],
    "mllw": [
        "+proj=vgridshift grids=GEOID",
        "+inv +proj=vgridshift grids=REGION/tss",
        "+proj=vgridshift grids=REGION/mllw",
    ],
    "noaa chart datum": [
        "+proj=vgridshift grids=GEOID",
        "+inv +proj=vgridshift grids=REGION/tss",
        "+proj=vgridshift grids=REGION/mllw",
    ],
    "mhw": [
        "+proj=vgridshift grids=GEOID",
        "+inv +proj=vgridshift grids=REGION/tss",
        "+proj=vgridshift grids=REGION/mhw",
    ],
    "noaa chart height": [
        "+proj=vgridshift grids=GEOID",
        "+inv +proj=vgridshift grids=REGION/tss",
        "+proj=vgridshift grids=REGION/mhw",
    ],
    "mtl": [
        "+proj=vgridshift grids=GEOID",
        "+inv +proj=vgridshift grids=REGION/tss",
        "+proj=vgridshift grids=REGION/mtl",
    ],
    "dtl": [
        "+proj=vgridshift grids=GEOID",
        "+inv +proj=vgridshift grids=REGION/tss",
        "+proj=vgridshift grids=REGION/dtl",
    ],
    "lwrp2007": [
        "+proj=vgridshift grids=GEOID",
        "+proj=vgridshift grids=REGION/lwrp2007",
    ],
    "hrd": [
        "+proj=vgridshift grids=GEOID",
        "+proj=vgridshift grids=REGION/hrd",
    ],
}

# Datums whose height is referenced directly to the ellipsoid/geoid family
# (used by uncertainty composition, reference core.py:337-347).
GEOID_FAMILY = {"ellipse", "geoid", "navd88"}


def _validate_datum_names(from_datum: str, to_datum: str) -> None:
    """Raise ValueError when a datum name is unknown
    (reference pipeline.py:97-113)."""
    for d in (from_datum, to_datum):
        if d not in DATUM_DEFINITION:
            raise ValueError(
                f"Datum {d!r} not found in datum definitions: "
                f"{list(DATUM_DEFINITION)}"
            )


def compare_datums(
    in_datum_def: list[str], out_datum_def: list[str]
) -> tuple[list[str], list[str]]:
    """Remove the common leading steps of two datum definitions.

    Positional comparison from the first entry, stopping implicitly when
    lists disagree — semantics of reference pipeline.py:116-142 (which
    collects positionally-equal entries and removes them by value).
    """
    n = min(len(in_datum_def), len(out_datum_def))
    common = [in_datum_def[i] for i in range(n) if in_datum_def[i] == out_datum_def[i]]
    in_out = list(in_datum_def)
    out_out = list(out_datum_def)
    for step in common:
        in_out.remove(step)
        out_out.remove(step)
    return in_out, out_out


def inverse_datum_def(datum_def: list[str]) -> list[str]:
    """Reverse a definition's steps and toggle ``+inv`` on each
    (reference pipeline.py:145-168)."""
    out = []
    for layer in reversed(datum_def):
        if "+inv" in layer:
            out.append(layer.replace("+inv ", ""))
        else:
            out.append("+inv " + layer)
    return out


def get_regional_pipeline(
    from_datum: str, to_datum: str, region_name: str, geoid_name: str
) -> str | None:
    """Compose the pipeline string between two datums for a region.

    Returns ``None`` for a same-datum no-op (reference pipeline.py:81-82).
    Substitutes ``REGION``/``GEOID`` placeholders
    (reference pipeline.py:91-92).
    """
    from_datum = from_datum.lower()
    to_datum = to_datum.lower()
    if from_datum == to_datum:
        return None
    _validate_datum_names(from_datum, to_datum)
    in_def, out_def = compare_datums(
        list(DATUM_DEFINITION[from_datum]), list(DATUM_DEFINITION[to_datum])
    )
    steps = ["+proj=pipeline", *inverse_datum_def(in_def), *out_def]
    pipeline = " +step ".join(steps)
    return pipeline.replace("REGION", region_name).replace("GEOID", geoid_name)


@dataclass(frozen=True)
class GridStep:
    """One vgridshift step: apply ``z - grid`` (forward) or ``z + grid``
    (inverse)."""

    grid_key: str  # e.g. 'SYNcoastA_8301/tss' or a geoid name
    inverse: bool

    @property
    def sign(self) -> float:
        """Contribution sign of the interpolated grid value to z."""
        return 1.0 if self.inverse else -1.0


def parse_pipeline(pipeline: str | None) -> list[GridStep]:
    """Parse a composed pipeline string into executable grid steps.

    Mirrors the reference's step scan (``raster.py:253-266``): split on
    ``' +step '``, keep ``vgridshift`` steps, read ``+inv`` and
    ``grids=...``.
    """
    if not pipeline:
        return []
    steps: list[GridStep] = []
    for cmd in pipeline.split(" +step "):
        if "vgridshift" not in cmd:
            continue
        inv = False
        grid_key = None
        for part in cmd.split():
            if part == "+inv":
                inv = True
            elif part.startswith("grids="):
                grid_key = part.split("=", 1)[1]
        if grid_key is None:
            raise ValueError(f"vgridshift step without grids=: {cmd!r}")
        steps.append(GridStep(grid_key=grid_key, inverse=inv))
    return steps


def resolve_grid_key(grid_key: str, available_grids) -> str | None:
    """Resolve a pipeline's grid key against the catalog, with the
    reference's extension-rewrite fallback (vypercrs.py:1044-1092: a
    ``.gtx`` pipeline reference is rewritten to the ``.tif`` conversion
    when that is what exists on disk). Here: the bare catalog key
    first, then the ``<key>.tif`` converted-grid variant. None when
    neither exists (-> region skipped, core.py:430-433)."""
    if grid_key in available_grids:
        return grid_key
    alt = grid_key + ".tif"
    if alt in available_grids:
        return alt
    return None


def resolve_pipeline(pipeline: str | None, available_grids) -> tuple[str | None, bool]:
    """Rewrite a pipeline's grid references to the keys that actually
    exist (extension fallback); returns (rewritten_pipeline, valid)."""
    if not pipeline:
        return pipeline, True
    out = pipeline
    for s in parse_pipeline(pipeline):
        r = resolve_grid_key(s.grid_key, available_grids)
        if r is None:
            return pipeline, False
        if r != s.grid_key:
            out = out.replace(f"grids={s.grid_key}", f"grids={r}")
    return out, True


def is_valid_regional_pipeline(pipeline: str | None, available_grids) -> bool:
    """True when every grid a pipeline references exists in the catalog,
    directly or via the ``.tif`` extension fallback (reference
    vypercrs.py:1044-1092)."""
    return resolve_pipeline(pipeline, available_grids)[1]
