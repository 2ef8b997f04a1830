"""Uncertainty composition for a datum transformation.

Semantics of the reference's ``_get_output_uncertainty``
(``reference/vyperdatum/core.py:313-355``): a plain scalar SUM (not
root-sum-square) selected by the in/out datum classes:

* output datum with no pipeline (``ellipse``) -> 0,
* ``in == ellipse`` and ``out != ellipse`` -> add the geoid sigma,
* ``in`` in {ellipse, geoid, navd88} and ``out`` not in that family ->
  add the region's ``tss`` sigma,
* ``out`` not in {ellipse, geoid, tss, navd88} -> add the region's sigma
  for the target surface, with the aliases
  ``noaa chart datum -> mllw`` and ``noaa chart height -> mhw``.

The addition ORDER is fixed (geoid, then tss, then target) and mirrored
in the DuckDB oracle so float64 sums are bit-identical.

Region sigma tables come from the catalog (the reference parses
``vdatum_sigma.inf`` cm -> m, ``core.py:915-969``; our catalog stores
meters directly).
"""

from __future__ import annotations

from vyperdatum_ray.core.pipeline_algebra import GEOID_FAMILY

_TARGET_ALIASES = {"noaa chart datum": "mllw", "noaa chart height": "mhw"}


def compose_uncertainty(
    in_datum: str,
    out_datum: str,
    region_sigmas: dict[str, float],
    geoid_sigma: float,
) -> float:
    """Scalar per-region uncertainty for a transform (meters)."""
    in_datum = in_datum.lower()
    out_datum = out_datum.lower()
    if out_datum == "ellipse":
        # no output pipeline -> no transformation uncertainty
        # (reference core.py:334-335)
        return 0.0
    total = 0.0
    if in_datum == "ellipse":
        total += geoid_sigma
    if in_datum in GEOID_FAMILY and out_datum not in GEOID_FAMILY:
        total += region_sigmas["tss"]
    if out_datum not in (GEOID_FAMILY | {"tss"}):
        target = _TARGET_ALIASES.get(out_datum, out_datum)
        total += region_sigmas[target]
    return total
