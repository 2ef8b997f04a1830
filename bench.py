"""Benchmark harness: runs the headline pipelines over $GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line.

    python bench.py               # per-query seconds + flagship rows/s
    python bench.py --scaling     # same flagship job at 8 and 32 CPUs in
                                  # fresh processes -> scaling efficiency

The driver records the JSON as BENCH_r{N}.json. ``value`` is the
flagship end-to-end wall seconds (geocode -> cell index -> PIP join ->
datum transform over the pages table); ``rows_per_s`` is the matching
throughput for BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# Headline pipelines benchmarked per round (a representative slice of
# queries(): the flagship geospatial path, a shuffle-heavy relational
# aggregate, dedup/LSH, vectorized text scoring, and ANN).
BENCH_QUERIES = [
    "flagship",
    "tile_counts",
    "region_counts",
    "transform_summary",
    "tpch_q1",
    "orders_customer_join",
    "dedup_exact",
    "minhash_pairs",
    "token_count",
    "quality_score",
    "simhash",
    "langid",
    "ann_topk",
    "html_stats",
]


def _consume(res) -> int:
    """Materialize a query result enough to force full execution; return
    row count."""
    import pandas as pd
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = 0
        for b in res.iter_batches(batch_format="pyarrow", batch_size=None):
            n += b.num_rows
        return n
    if isinstance(res, (pd.DataFrame, pa.Table)):
        return len(res)
    return 0


def _pages_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    from vyperdatum_ray.fixtures import ensure_fixtures, pages_paths

    ensure_fixtures(sf_dir)
    return sum(pq.ParquetFile(p).metadata.num_rows for p in pages_paths(sf_dir))


def run_once(num_cpus: int, queries: list[str]) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __ray_entry__ as E

    qs = E.queries()
    n_pages = _pages_rows(SF_DIR)

    timings: dict[str, float] = {}
    counts: dict[str, int] = {}
    for name in queries:
        t0 = time.perf_counter()
        counts[name] = _consume(qs[name](SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    flagship_s = timings.get("flagship", sum(timings.values()))
    out = {
        "metric": "flagship geocode+PIP-join+datum-transform e2e seconds",
        "value": flagship_s,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": num_cpus,
        "rows_per_s": round(n_pages / flagship_s, 1) if flagship_s else None,
        "input_rows": n_pages,
        "output_rows": counts,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    """Same flagship job at two parallelism levels in fresh processes
    (sandbox stand-in for N vs 4N nodes); efficiency =
    (T_low * cpus_low) / (T_high * cpus_high)."""
    lo, hi = 8, 32
    results = {}
    for n in (lo, hi):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=SF_DIR)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", "flagship"],
            capture_output=True, text=True, env=env, timeout=3600,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
    t_lo, t_hi = results[lo]["value"], results[hi]["value"]
    eff = (t_lo / t_hi) / (hi / lo)
    return {
        "metric": "flagship scaling efficiency (8 -> 32 CPUs, fresh sessions)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": SF_DIR,
        "low": {"num_cpus": lo, "sec": t_lo, "rows_per_s": results[lo]["rows_per_s"]},
        "high": {"num_cpus": hi, "sec": t_hi, "rows_per_s": results[hi]["rows_per_s"]},
        "speedup": round(t_lo / t_hi, 2),
    }


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--scaling":
        print(json.dumps(run_scaling()))
    elif args and args[0] == "--one":
        print(json.dumps(run_once(NUM_CPUS, args[1:] or BENCH_QUERIES)))
    else:
        print(json.dumps(run_once(NUM_CPUS, BENCH_QUERIES)))


if __name__ == "__main__":
    main()
