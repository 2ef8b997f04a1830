"""Stateless cell-index stage (SURVEY.md M11 + O5 tile assignment):
S2 level-13 + H3-style res-9 hex cell + output tile key per point."""

from __future__ import annotations

import pyarrow as pa

from vyperdatum_ray.core.cells import TILE_DEG, hex_cell_id, s2_cell_id, tile_id


def cell_index_batch(batch: pa.Table, *, hex_res: int = 9, s2_level: int = 13,
                     tile_deg: float = TILE_DEG) -> pa.Table:
    lat = batch.column("lat").to_numpy(zero_copy_only=False)
    lon = batch.column("lon").to_numpy(zero_copy_only=False)
    return (
        batch.append_column("h3_9", pa.array(hex_cell_id(lon, lat, hex_res), pa.uint64()))
        .append_column("s2_13", pa.array(s2_cell_id(lon, lat, s2_level), pa.uint64()))
        .append_column("tile_id", pa.array(tile_id(lon, lat, tile_deg), pa.int64()))
    )
