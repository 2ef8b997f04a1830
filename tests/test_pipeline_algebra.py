"""Pipeline-algebra unit tests — ports of the reference's assertions
(reference tests/test_pipeline.py, tests/test_vypercrs.py:73-104,
371-385)."""

import pytest

from vyperdatum_ray.core.pipeline_algebra import (
    compare_datums,
    get_regional_pipeline,
    inverse_datum_def,
    is_valid_regional_pipeline,
    parse_pipeline,
)


def steps_of(p):
    return parse_pipeline(p)


def test_ellipse_to_mllw_three_steps():
    p = get_regional_pipeline("ellipse", "mllw", "R1", "g2012")
    s = steps_of(p)
    assert [x.grid_key for x in s] == ["g2012", "R1/tss", "R1/mllw"]
    assert [x.inverse for x in s] == [False, True, False]


def test_mllw_to_ellipse_is_reversed_with_toggled_inv():
    p = get_regional_pipeline("mllw", "ellipse", "R1", "g2012")
    s = steps_of(p)
    assert [x.grid_key for x in s] == ["R1/mllw", "R1/tss", "g2012"]
    assert [x.inverse for x in s] == [True, False, True]


def test_tss_to_mllw_prefix_cancellation_single_step():
    p = get_regional_pipeline("tss", "mllw", "R1", "g2012")
    s = steps_of(p)
    assert len(s) == 1
    assert s[0].grid_key == "R1/mllw" and not s[0].inverse


def test_navd88_to_mllw_two_steps():
    p = get_regional_pipeline("navd88", "mllw", "R1", "g2012")
    s = steps_of(p)
    assert [x.grid_key for x in s] == ["R1/tss", "R1/mllw"]
    assert [x.inverse for x in s] == [True, False]


def test_same_datum_is_noop():
    assert get_regional_pipeline("mllw", "mllw", "R1", "g") is None
    assert parse_pipeline(None) == []


def test_case_insensitive():
    assert get_regional_pipeline("MLLW", "Ellipse", "R1", "g") == get_regional_pipeline(
        "mllw", "ellipse", "R1", "g"
    )


def test_unknown_datum_raises():
    with pytest.raises(ValueError):
        get_regional_pipeline("ellipse", "nonsense", "R1", "g")


def test_compare_datums_reduces_common_prefix():
    a = ["s1", "s2", "s3"]
    b = ["s1", "s2", "s4"]
    ra, rb = compare_datums(a, b)
    assert ra == ["s3"] and rb == ["s4"]


def test_inverse_datum_def_toggles():
    d = ["+proj=vgridshift grids=G", "+inv +proj=vgridshift grids=R/tss"]
    inv = inverse_datum_def(d)
    assert inv == ["+proj=vgridshift grids=R/tss", "+inv +proj=vgridshift grids=G"]


def test_pipeline_validation_against_catalog():
    p = get_regional_pipeline("ellipse", "mllw", "R1", "g2012")
    assert is_valid_regional_pipeline(p, {"g2012", "R1/tss", "R1/mllw"})
    assert not is_valid_regional_pipeline(p, {"g2012", "R1/tss"})
    assert is_valid_regional_pipeline(None, set())


def test_grid_extension_fallback():
    """Reference vypercrs.py:1044-1092: a pipeline referencing a grid
    that only exists as its .tif conversion is rewritten, not
    invalidated; a truly missing grid still invalidates."""
    from vyperdatum_ray.core.pipeline_algebra import (
        get_regional_pipeline, is_valid_regional_pipeline, resolve_grid_key,
        resolve_pipeline)

    p = get_regional_pipeline("ellipse", "mllw", "R1", "geoidx")
    grids_tif = {"geoidx", "R1/tss.tif", "R1/mllw"}
    assert resolve_grid_key("R1/tss", grids_tif) == "R1/tss.tif"
    rewritten, ok = resolve_pipeline(p, grids_tif)
    assert ok and "grids=R1/tss.tif" in rewritten and "grids=R1/mllw" in rewritten
    assert is_valid_regional_pipeline(p, grids_tif)
    assert not is_valid_regional_pipeline(p, {"geoidx", "R1/mllw"})
