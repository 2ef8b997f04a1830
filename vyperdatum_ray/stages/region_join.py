"""RegionJoiner: the broadcast spatial join (SURVEY.md J1/J2, T1).

A stateful actor-pool stage: the STR-packed tree of prepared region
polygons is built ONCE per actor in ``__init__`` from the broadcast
catalog (``ray.put`` on the driver, zero-copy ``ray.get`` here — the
region catalog is tiny relative to the data, so the join needs no
shuffle; cf. reference ``set_region_by_bounds``/per-region transform
loop, core.py:86-158, 421-453, which re-opens polygon files per call).

Emits ``region_mask`` — a uint64 bitmask of catalog-order region
memberships per point (explicit point-in-polygon, as the north_star
mandates) — and ``pip_region_index``, the last containing region in
catalog order (int8, -1 when none; the catalog-order overwrite rule of
core.py:421-453 before grid-coverage fallback is applied downstream).
A catalog with >64 regions would switch the mask to a list column; the
VDatum catalog has 52 regions (vdatum_validation.py:1334-1382).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


class RegionJoiner:
    def __init__(self, catalog_ref) -> None:
        self.catalog = ray.get(catalog_ref) if isinstance(catalog_ref, ray.ObjectRef) else catalog_ref
        if len(self.catalog.regions) > 64:
            raise NotImplementedError("region bitmask limited to 64 regions")
        self.tree = self.catalog.tree()

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch.column("lon").to_numpy(zero_copy_only=False)
        lat = batch.column("lat").to_numpy(zero_copy_only=False)
        memb = self.tree.query_points(lon, lat)  # (n, R) bool
        mask = np.zeros(len(lon), dtype=np.uint64)
        pip_idx = np.full(len(lon), -1, dtype=np.int8)
        for i in range(memb.shape[1]):
            col = memb[:, i]
            mask |= col.astype(np.uint64) << np.uint64(i)
            pip_idx[col] = i  # later catalog order overwrites
        return (
            batch.append_column("region_mask", pa.array(mask, pa.uint64()))
            .append_column("pip_region_index", pa.array(pip_idx, pa.int8()))
        )
