"""Planar geometry: polygons, vectorized point-in-polygon, and an
STR-packed bounding-box tree.

From-scratch replacement for the reference's OGR feature scans and
``Intersect`` tests (``reference/vyperdatum/core.py:86-158``); no GEOS /
shapely in this environment.

Conventions:

* A polygon is an (n, 2) float64 vertex ring (closed or open; closing
  vertex optional), vertices in any winding order.
* ``points_in_polygon`` is a vectorized even-odd ray cast. Points exactly
  on an edge may land on either side (the fixture generator keeps test
  points off polygon boundaries; convex fixtures additionally carry
  half-plane edge tables so the DuckDB oracle can reproduce membership
  without a geometry library).
"""

from __future__ import annotations

import numpy as np


class Polygon:
    def __init__(self, vertices) -> None:
        v = np.asarray(vertices, dtype=np.float64)
        if v.ndim != 2 or v.shape[1] != 2 or v.shape[0] < 3:
            raise ValueError("polygon needs an (n>=3, 2) vertex array")
        # drop an explicit closing vertex
        if np.all(v[0] == v[-1]):
            v = v[:-1]
        self.vertices = v
        self.min_x, self.min_y = v.min(axis=0)
        self.max_x, self.max_y = v.max(axis=0)

    @property
    def bounds(self) -> tuple[float, float, float, float]:
        return (self.min_x, self.min_y, self.max_x, self.max_y)

    def contains(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return points_in_polygon(x, y, self.vertices)

    def intersects_bbox(self, x_min, y_min, x_max, y_max) -> bool:
        """Conservative polygon-vs-rectangle intersection: bbox overlap,
        then accept if any vertex of either shape lies in the other, or
        any edges cross. Sufficient for region *candidate* discovery
        (reference ``set_region_by_bounds`` uses OGR Intersect on the
        data-extent rectangle, core.py:86-158)."""
        if (
            self.max_x < x_min
            or self.min_x > x_max
            or self.max_y < y_min
            or self.min_y > y_max
        ):
            return False
        # any polygon vertex inside the rectangle?
        v = self.vertices
        if np.any(
            (v[:, 0] >= x_min) & (v[:, 0] <= x_max) & (v[:, 1] >= y_min) & (v[:, 1] <= y_max)
        ):
            return True
        # any rectangle corner inside the polygon?
        cx = np.array([x_min, x_max, x_max, x_min])
        cy = np.array([y_min, y_min, y_max, y_max])
        if np.any(self.contains(cx, cy)):
            return True
        # edge-crossing check
        rect = np.array(
            [[x_min, y_min], [x_max, y_min], [x_max, y_max], [x_min, y_max]]
        )
        closed = np.vstack([v, v[:1]])
        rclosed = np.vstack([rect, rect[:1]])
        for i in range(len(closed) - 1):
            for j in range(4):
                if _segments_cross(closed[i], closed[i + 1], rclosed[j], rclosed[j + 1]):
                    return True
        return False


def _segments_cross(p1, p2, q1, q2) -> bool:
    d1 = np.cross(q2 - q1, p1 - q1)
    d2 = np.cross(q2 - q1, p2 - q1)
    d3 = np.cross(p2 - p1, q1 - p1)
    d4 = np.cross(p2 - p1, q2 - p1)
    return bool(((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)))


def points_in_polygon(x: np.ndarray, y: np.ndarray, vertices: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast: horizontal ray to +x.

    Loops over edges (polygons are small, point arrays are big) — the
    vectorization axis is points, which is the scale axis.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    v = np.asarray(vertices, dtype=np.float64)
    n = v.shape[0]
    inside = np.zeros(x.shape, dtype=bool)
    x1, y1 = v[-1]
    for k in range(n):
        x2, y2 = v[k]
        if y1 != y2:
            cond = (y1 > y) != (y2 > y)
            # x coordinate of edge at the point's y
            xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
            inside ^= cond & (x < xi)
        x1, y1 = x2, y2
    return inside


def polygon_to_wkb(vertices: np.ndarray) -> bytes:
    """Minimal WKB (little-endian, Polygon, single ring, auto-closed) so
    the region catalog stores standard geometry bytes."""
    import struct

    v = np.asarray(vertices, dtype=np.float64)
    if not np.all(v[0] == v[-1]):
        v = np.vstack([v, v[:1]])
    out = [struct.pack("<BII", 1, 3, 1), struct.pack("<I", len(v))]
    for px, py in v:
        out.append(struct.pack("<dd", px, py))
    return b"".join(out)


def polygon_from_wkb(buf: bytes) -> Polygon:
    import struct

    byte_order, geom_type = struct.unpack_from("<BI", buf, 0)
    if byte_order != 1 or geom_type != 3:
        raise ValueError("only little-endian single-ring WKB Polygon supported")
    (nrings,) = struct.unpack_from("<I", buf, 5)
    if nrings != 1:
        raise ValueError("only single-ring polygons supported")
    (npts,) = struct.unpack_from("<I", buf, 9)
    pts = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=13).reshape(npts, 2)
    return Polygon(pts)


class STRtree:
    """Sort-Tile-Recursive packed bbox tree over geometries.

    With VDatum-scale catalogs (~52 regions,
    reference ``vdatum_validation.py:1334-1382``) this is deliberately a
    flat packed structure: leaves are grouped into tiles of
    ``node_capacity`` and queries prune by group bbox, then test leaf
    bboxes vectorized. O(sqrt(R)) groups; exact PIP runs only on bbox
    survivors.
    """

    def __init__(self, geoms: list[Polygon], node_capacity: int = 8) -> None:
        self.geoms = list(geoms)
        n = len(self.geoms)
        bounds = np.array([g.bounds for g in self.geoms], dtype=np.float64).reshape(n, 4)
        cx = (bounds[:, 0] + bounds[:, 2]) / 2
        cy = (bounds[:, 1] + bounds[:, 3]) / 2
        # STR packing: sort by center x, slice into vertical strips, sort
        # each strip by center y, chunk into nodes.
        nslices = max(1, int(np.ceil(np.sqrt(max(1, n) / node_capacity))))
        per_slice = int(np.ceil(n / nslices))
        order_x = np.argsort(cx, kind="stable")
        leaf_order = []
        for s in range(nslices):
            strip = order_x[s * per_slice : (s + 1) * per_slice]
            leaf_order.extend(strip[np.argsort(cy[strip], kind="stable")])
        self.leaf_order = np.array(leaf_order, dtype=np.int64)
        self.leaf_bounds = bounds[self.leaf_order]
        self.node_slices = [
            slice(i, min(i + node_capacity, n)) for i in range(0, n, node_capacity)
        ]
        self.node_bounds = np.array(
            [
                [
                    self.leaf_bounds[s, 0].min(),
                    self.leaf_bounds[s, 1].min(),
                    self.leaf_bounds[s, 2].max(),
                    self.leaf_bounds[s, 3].max(),
                ]
                for s in self.node_slices
            ],
            dtype=np.float64,
        ).reshape(len(self.node_slices), 4)

    def query_bbox(self, x_min, y_min, x_max, y_max) -> list[int]:
        """Original indices of geometries whose bbox overlaps the query
        rectangle, in insertion (catalog) order."""
        hits: list[int] = []
        for node, s in zip(self.node_bounds, self.node_slices):
            if node[0] > x_max or node[2] < x_min or node[1] > y_max or node[3] < y_min:
                continue
            lb = self.leaf_bounds[s]
            m = (lb[:, 0] <= x_max) & (lb[:, 2] >= x_min) & (lb[:, 1] <= y_max) & (lb[:, 3] >= y_min)
            hits.extend(int(i) for i in self.leaf_order[s][m])
        return sorted(hits)

    def query_points(self, x: np.ndarray, y: np.ndarray) -> np.ndarray:
        """Boolean membership matrix (n_points, n_geoms): bbox prune per
        geometry, exact PIP on survivors."""
        x = np.asarray(x, np.float64)
        y = np.asarray(y, np.float64)
        out = np.zeros((x.shape[0], len(self.geoms)), dtype=bool)
        for gi in self.query_bbox(x.min(), y.min(), x.max(), y.max()) if x.size else []:
            g = self.geoms[gi]
            cand = (x >= g.min_x) & (x <= g.max_x) & (y >= g.min_y) & (y <= g.max_y)
            if cand.any():
                idx = np.nonzero(cand)[0]
                out[idx, gi] = g.contains(x[idx], y[idx])
        return out
