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

import numpy as np
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


def read_geocoded(
    sf_dir: str,
    paths: list[str] | None = None,
    include_paths: bool = False,
) -> ray.data.Dataset:
    """Read + geocode fused into ONE task stage: the page text is parsed
    where it is read and never crosses an object-store boundary — only
    the slim (url, lat, lon[, path]) stream leaves the task.

    Measured on this box (BASELINE.md round 3): vs the read-task ->
    fused-actor shape (text crossing the store once), this DOUBLES
    flagship throughput at 8 CPUs (3.7M -> 7.6M rows/s) and reaches
    14.6M rows/s at 16 — store serialization of wide strings is real
    CPU work, not just memory traffic. The trade: geocode no longer
    runs in the transform actor pool, so the read tasks must be
    numerous enough to fill the machine (one task per input shard —
    exactly the production layout)."""
    files = sorted(paths or pages_paths(sf_dir))
    items = [{"path": p} for p in files]
    pds = ray.data.from_items(items, override_num_blocks=len(items))
    keep = ["url", "lat", "lon"] + (["path"] if include_paths else [])

    def read_one(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        outs = []
        for p in batch.column("path").to_pylist():
            t = pq.read_table(p, columns=["url", "text"])
            g = keep_geocoded(geocode_batch(t))
            if include_paths:
                g = g.append_column("path", pa.array([p] * g.num_rows, pa.string()))
            outs.append(g.select(keep))
        return pa.concat_tables(outs)

    return pds.map_batches(read_one, batch_format="pyarrow", batch_size=None)


def geocoded_pages(
    sf_dir: str,
    columns: list[str] | None = None,
    paths: list[str] | None = None,
    include_paths: bool = False,
    input_ds: ray.data.Dataset | None = None,
    carry_text: bool = True,
) -> ray.data.Dataset:
    """pages -> geocode -> keep geocoded -> cell index.

    ``paths`` restricts the read to specific input shards (resume prunes
    completed shards here, at the read); ``include_paths`` carries the
    source file as a ``path`` column for lineage tagging; ``input_ds``
    substitutes a pre-built pages Dataset for the read.

    ``carry_text=False`` projects the wide string columns (text, lang,
    warc_ts, geocode_src) out right after the geocode filter, INSIDE the
    fused actor chain: consumers that never emit text (the checkpointed
    production sink, the scaling bench) then push only ~100 B/row
    through the actor-output object-store boundary instead of dragging
    the full page text across it — on this box that boundary is the
    memory-bandwidth hot spot past ~16 cores (BASELINE.md round 3)."""
    ds = input_ds if input_ds is not None else ray.data.read_parquet(
        paths or pages_paths(sf_dir),
        columns=columns or PAGE_COLUMNS,
        include_paths=include_paths,
    )
    ds = ds.map_batches(geocode_batch, batch_format="pyarrow")
    ds = ds.map_batches(keep_geocoded, batch_format="pyarrow")
    if not carry_text:
        keep = ["url", "lat", "lon"] + (["path"] if include_paths else [])
        ds = ds.map_batches(lambda t, cols=tuple(keep): t.select(list(cols)),
                            batch_format="pyarrow")
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
    carry_text: bool = True,
    geocode_in_read: bool = False,
) -> ray.data.Dataset:
    """Full geocode + PIP join + datum transform stream; returns the lazy
    Dataset (caller writes or aggregates). ``carry_text=False`` drops
    the page text inside the fused chain for consumers whose output
    schema never includes it (see geocoded_pages);
    ``geocode_in_read=True`` additionally fuses geocode into the read
    TASK so text never enters the object store at all (see
    read_geocoded — the production checkpointed sink and the scaling
    bench use this shape)."""
    catalog = catalog or load_catalog(sf_dir)
    catalog_ref = ray.put(catalog)
    if geocode_in_read:
        # input_ds, when given, is an ALREADY-geocoded slim stream
        # (url, lat, lon, ...) produced by a read_geocoded-shaped stage
        ds = input_ds if input_ds is not None else read_geocoded(
            sf_dir, paths=paths, include_paths=include_paths)
        ds = ds.map_batches(cell_index_batch, batch_format="pyarrow")
    else:
        ds = geocoded_pages(sf_dir, paths=paths, include_paths=include_paths,
                            input_ds=input_ds, carry_text=carry_text)
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


def synth_z_batch(batch: pa.Table) -> pa.Table:
    """Deterministic synthetic input depth from the parsed coordinates
    — the z source the itrf variant and its DuckDB oracle both compute
    (round((lat - 35) * 2 + (lon + 75), 3)); lives here so the fused
    and staged shapes share the bit-identical expression."""
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    z = np.round((lat - 35.0) * 2.0 + (lon + 75.0), 3)
    return batch.append_column("z_in", pa.array(z, pa.float64()))


class FusedReadTransform:
    """The WHOLE flagship per input shard in ONE actor call: parquet
    read -> geocode -> cell index -> PIP join -> datum transform,
    emitting only the slim transformed stream. NOTHING crosses the
    object store between stages — not even the (url, lat, lon) slim
    stream that the geocode_in_read shape still ships from read tasks
    into the transform actor pool.

    Measured on this box (BASELINE.md round 4): vs the read-task ->
    actor-pool shape, 16.4M -> 26.8M rows/s at 32 CPUs, 6.7M -> 13.4M
    at 8, 2.6-3.9M -> 5.3M at 4 (repeat=256 saturation runs) — the
    ~16M rows/s '32-CPU wall' was the task->actor store boundary, not
    parse compute. This is the production sink shape
    (state/lineage.py) and the scaling-bench shape; the text-carrying
    flagship query keeps the unfused chain because its OUTPUT is the
    text (M12 passthrough).

    ``inner`` replicates each shard's transformed rows in-place (the
    scaling bench's honest-extra-work knob; 1 in production)."""

    def __init__(self, catalog_ref, from_datum="ellipse", to_datum="mllw",
                 in_is_height=True, out_is_height=False,
                 include_paths=False, inner=1,
                 z_col=None, out_frame=None, emit_xy=False, synth_z=False,
                 project_fwd=None, project_inv=None, project_code=None,
                 with_cells=True):
        self.jt = JoinTransform(
            catalog_ref=catalog_ref, from_datum=from_datum, to_datum=to_datum,
            in_is_height=in_is_height, out_is_height=out_is_height,
            z_col=z_col, out_frame=out_frame, emit_xy=emit_xy,
        )
        self.include_paths = include_paths
        self.inner = inner
        self.synth_z = synth_z
        # projected-input roundtrip hook (M1): fwd defines the projected
        # input from the geocoded coords (as the reference's UTM goldens
        # do), inv recovers geographic — both run inside the fused call
        self.project_fwd = project_fwd
        self.project_inv = project_inv
        self.project_code = project_code
        self.with_cells = with_cells

    def _project(self, base: pa.Table) -> pa.Table:
        lon = base.column("lon").to_numpy(zero_copy_only=False)
        lat = base.column("lat").to_numpy(zero_copy_only=False)
        easting, northing = self.project_fwd(lon, lat, self.project_code)
        rlon, rlat = self.project_inv(easting, northing, self.project_code)
        # EMITTED projected coords are quantized to cm (the kernels'
        # 0.1 mm values still feed the inverse): the SQL mirror
        # recomputes the forward with DuckDB's libm, whose sin/cos/
        # exp/ln can differ from numpy's by ~1 ULP — at 0.1 mm that
        # tie flipped 2 of 294k sf0.1 points; at cm the flip needs a
        # 1-tick 4-decimal straddle exactly on a .005 boundary
        # (~1e-9/point)
        out = pa.table({
            "url": base.column("url"),
            "easting": pa.array(np.round(easting, 2), pa.float64()),
            "northing": pa.array(np.round(northing, 2), pa.float64()),
            "lon": pa.array(rlon, pa.float64()),
            "lat": pa.array(rlat, pa.float64()),
        })
        # carry any extra columns (e.g. a synthesized z) through the
        # roundtrip instead of silently dropping them
        for name in base.column_names:
            if name not in ("url", "lat", "lon"):
                out = out.append_column(name, base.column(name))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq

        outs = []
        for p in batch.column("path").to_pylist():
            t = pq.read_table(p, columns=["url", "text"])
            base = keep_geocoded(geocode_batch(t)).select(["url", "lat", "lon"])
            if self.synth_z:
                base = synth_z_batch(base)
            if self.project_fwd is not None:
                base = self._project(base)
            # replication happens BEFORE the transform so every emitted
            # row carries full cell-index + PIP + transform work (the
            # read/geocode amortization matches the old scaling shape;
            # replicating the TRANSFORMED table would make the inner
            # copies zero-cost metadata and fake the throughput)
            for _ in range(self.inner):
                g = self.jt(cell_index_batch(base) if self.with_cells else base)
                if self.include_paths:
                    g = g.append_column(
                        "path", pa.array([p] * g.num_rows, pa.string()))
                outs.append(g)
        return pa.concat_tables(outs)


def flagship_fused(
    sf_dir: str,
    catalog: Catalog | None = None,
    paths: list[str] | None = None,
    include_paths: bool = False,
    inner: int = 1,
    from_datum: str = "ellipse",
    to_datum: str = "mllw",
    in_is_height: bool = True,
    out_is_height: bool = False,
    z_col: str | None = None,
    out_frame: str | None = None,
    emit_xy: bool = False,
    synth_z: bool = False,
    project_fwd=None,
    project_inv=None,
    project_code=None,
    with_cells: bool = True,
) -> ray.data.Dataset:
    """Flagship as a single fused actor-pool stage over shard paths —
    see FusedReadTransform. One ~90%-CPU pool, one path row per task."""
    catalog = catalog or load_catalog(sf_dir)
    catalog_ref = ray.put(catalog)
    files = sorted(paths or pages_paths(sf_dir))
    items = [{"path": p} for p in files]
    pds = ray.data.from_items(items, override_num_blocks=len(items))
    return pds.map_batches(
        FusedReadTransform,
        fn_constructor_kwargs={
            "catalog_ref": catalog_ref, "from_datum": from_datum,
            "to_datum": to_datum, "in_is_height": in_is_height,
            "out_is_height": out_is_height,
            "include_paths": include_paths, "inner": inner,
            "z_col": z_col, "out_frame": out_frame, "emit_xy": emit_xy,
            "synth_z": synth_z, "project_fwd": project_fwd,
            "project_inv": project_inv, "project_code": project_code,
            "with_cells": with_cells,
        },
        batch_format="pyarrow", batch_size=1,
        concurrency=_pool_size(), num_cpus=1,
    )
