"""The flagship end-to-end pipeline (SURVEY.md §3.4):

``read_parquet(pages, columns pruned) -> geocode -> filter -> cell index
-> RegionJoiner (actor pool, STRtree PIP) -> DatumTransformer (actor
pool, grid interpolation) -> tile-partitioned parquet``.

Everything streams: no full materialization; the ``html`` binary column
is pruned at the read (at 10^12-doc scale the pipeline lives or dies on
that) unless a stage needs it.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray
import ray.data

from vyperdatum_ray.catalog import Catalog
from vyperdatum_ray.fixtures import catalog_dir, pages_paths
from vyperdatum_ray.stages.cellindex import cell_index_batch
from vyperdatum_ray.stages.geocode import geocode_batch, keep_geocoded
from vyperdatum_ray.stages.region_join import RegionJoiner
from vyperdatum_ray.stages.transform import DatumTransformer

PAGE_COLUMNS = ["url", "warc_ts", "text", "lang"]  # html pruned at the read


def _pool_size() -> int:
    """Fixed actor-pool size for the single combined stateful stage:
    ~90% of the CPUs (headroom for read/write tasks). Fixed rather than
    autoscaling (1, n) — the ramp from 1 actor dominates wall time on
    short jobs and wastes nothing on long ones. Ray fuses the upstream
    stateless maps (geocode/cell-index) into this pool, so the pool
    size IS the pipeline's parallelism: one pool at 90% beats two
    half-size pools in series."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    frac = float(os.environ.get("VDR_POOL_FRAC", "0.9"))
    return max(2, int(cpus * frac))


class JoinTransform:
    """RegionJoiner + DatumTransformer composed in one actor — one
    STRtree + one grid set per worker, one actor pool instead of two
    half-size pools with an extra object-store hop between them."""

    def __init__(self, catalog_ref, from_datum, to_datum, in_is_height, out_is_height,
                 z_col=None, out_frame=None, emit_xy=False):
        # Each actor is scheduled at num_cpus=1; pyarrow's internal pool
        # defaults to ALL cores, so N actors x N cores of kernel threads
        # thrash the box. One compute thread per actor — but ONLY inside
        # Ray workers: constructing this class on the driver (the
        # sampled accelerator does, for its tiny center set) must not
        # throttle the driver's Arrow pool for the rest of the session.
        try:
            in_worker = ray.get_runtime_context().worker.mode == ray.WORKER_MODE
        except Exception:
            in_worker = False
        if in_worker:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
        self.join = RegionJoiner(catalog_ref=catalog_ref)
        self.transform = DatumTransformer(
            catalog_ref=catalog_ref, from_datum=from_datum, to_datum=to_datum,
            in_is_height=in_is_height, out_is_height=out_is_height,
            z_col=z_col, out_frame=out_frame, emit_xy=emit_xy,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.transform(self.join(batch))


def load_catalog(sf_dir: str) -> Catalog:
    return Catalog.from_dir(catalog_dir(sf_dir))


def geocoded_pages(
    sf_dir: str,
    columns: list[str] | None = None,
    paths: list[str] | None = None,
    include_paths: bool = False,
    input_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """pages -> geocode -> keep geocoded -> cell index.

    ``paths`` restricts the read to specific input shards (resume prunes
    completed shards here, at the read); ``include_paths`` carries the
    source file as a ``path`` column for lineage tagging; ``input_ds``
    substitutes a pre-built pages Dataset for the read."""
    ds = input_ds if input_ds is not None else ray.data.read_parquet(
        paths or pages_paths(sf_dir),
        columns=columns or PAGE_COLUMNS,
        include_paths=include_paths,
    )
    ds = ds.map_batches(geocode_batch, batch_format="pyarrow")
    ds = ds.map_batches(keep_geocoded, batch_format="pyarrow")
    ds = ds.map_batches(cell_index_batch, batch_format="pyarrow")
    return ds


def flagship_pipeline(
    sf_dir: str,
    from_datum: str = "ellipse",
    to_datum: str = "mllw",
    catalog: Catalog | None = None,
    batch_size: int = 16384,
    paths: list[str] | None = None,
    include_paths: bool = False,
    in_is_height: bool = True,
    out_is_height: bool = False,
    input_ds: ray.data.Dataset | None = None,
) -> ray.data.Dataset:
    """Full geocode + PIP join + datum transform stream; returns the lazy
    Dataset (caller writes or aggregates)."""
    catalog = catalog or load_catalog(sf_dir)
    catalog_ref = ray.put(catalog)
    ds = geocoded_pages(sf_dir, paths=paths, include_paths=include_paths,
                        input_ds=input_ds)
    ds = ds.map_batches(
        JoinTransform,
        fn_constructor_kwargs={
            "catalog_ref": catalog_ref,
            "from_datum": from_datum,
            "to_datum": to_datum,
            "in_is_height": in_is_height,
            "out_is_height": out_is_height,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=_pool_size(),
        num_cpus=1,
    )
    return ds
