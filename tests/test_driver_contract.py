"""Structural guards for the driver contract in __ray_entry__.py:
every oracle key has a query, callables accept an sf_dir, entry() is
wired, and no library module calls ray.init."""

import inspect
import subprocess
import sys


def test_oracle_keys_subset_of_queries():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    qs, os_ = E.queries(), E.oracle_sql()
    assert set(os_) <= set(qs)
    # the SQL-checkable surface should stay the clear majority
    assert len(os_) >= 0.6 * len(qs)


def test_queries_take_sf_dir():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    for name, fn in E.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert params and params[0] == "sf_dir", name


def test_no_ray_init_in_library():
    """Only bench.py, scripts/ and the test fixture own a Ray session."""
    out = subprocess.run(
        ["grep", "-rn", "ray.init(", "/root/repo/vyperdatum_ray", "/root/repo/__ray_entry__.py"],
        capture_output=True, text=True,
    )
    assert out.stdout.strip() == "", out.stdout
