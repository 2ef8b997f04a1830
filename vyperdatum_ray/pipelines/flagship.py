"""The flagship end-to-end pipeline (SURVEY.md §3.4):

``read_parquet(pages, columns pruned) -> geocode -> filter -> cell index
-> RegionJoiner (actor pool, STRtree PIP) -> DatumTransformer (actor
pool, grid interpolation) -> tile-partitioned parquet``.

Everything streams: no full materialization; the ``html`` binary column
is pruned at the read (at 10^12-doc scale the pipeline lives or dies on
that) unless a stage needs it.
"""

from __future__ import annotations

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


def _pool_size() -> tuple[int, int]:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (1, max(2, cpus // 2))


def load_catalog(sf_dir: str) -> Catalog:
    return Catalog.from_dir(catalog_dir(sf_dir))


def geocoded_pages(
    sf_dir: str,
    columns: list[str] | None = None,
    paths: list[str] | None = None,
    include_paths: bool = False,
) -> ray.data.Dataset:
    """pages -> geocode -> keep geocoded -> cell index.

    ``paths`` restricts the read to specific input shards (resume prunes
    completed shards here, at the read); ``include_paths`` carries the
    source file as a ``path`` column for lineage tagging."""
    ds = ray.data.read_parquet(
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
) -> ray.data.Dataset:
    """Full geocode + PIP join + datum transform stream; returns the lazy
    Dataset (caller writes or aggregates)."""
    catalog = catalog or load_catalog(sf_dir)
    catalog_ref = ray.put(catalog)
    pool = _pool_size()
    ds = geocoded_pages(sf_dir, paths=paths, include_paths=include_paths)
    ds = ds.map_batches(
        RegionJoiner,
        fn_constructor_kwargs={"catalog_ref": catalog_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=1,
    )
    ds = ds.map_batches(
        DatumTransformer,
        fn_constructor_kwargs={
            "catalog_ref": catalog_ref,
            "from_datum": from_datum,
            "to_datum": to_datum,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
        num_cpus=1,
    )
    return ds
