"""Boolean union of polygons — dependency-free numpy kernels.

The reference dissolves overlapping geometries with shapely's
unary_union, which rewrites overlapping boundaries into one polygon
(georip/utils/pandas.py:163-183, georip/modeling/yolo/predict.py:301-311).
shapely is absent in this environment, so this module provides:

- ``union_area(mps)``: EXACT union area for arbitrary simple polygons
  (slab decomposition: split the plane at every vertex y and every
  pairwise edge-crossing y; inside each slab edges are non-crossing
  straight lines, so union coverage per slab is an interval merge and
  the area a sum of trapezoids). This is the measurable half of
  unary_union — engine parity with the reference is asserted on it.

- ``rect_union(mps)``: TRUE boolean union geometry (boundary
  rewritten, holes included) for rectilinear inputs — coordinate
  compression onto the grid of distinct x/y values, even-odd coverage
  of cell centers, then the exact rectilinear boundary tracer
  (rastervec.vectorize_mask) mapped back through the coordinate
  arrays. Covers the engine's dominant dissolve inputs (clipped tile
  rects, vectorized masks); non-rectilinear members fall back to
  MultiPolygon assembly (disclosed in dissolve.py).

Scale note: both run per dissolve component inside a grouped pandas
UDF — components are small by construction (they're the things being
merged); the O(E²) crossing enumeration is bounded by the component,
never the dataset.
"""

from __future__ import annotations

import numpy as np

MultiPolygon = list  # list[polygon]; polygon = list[ring]; ring = (n,2) ndarray


# ------------------------------------------------------------- area

def _edges_of(mps: list[MultiPolygon]) -> tuple[np.ndarray, np.ndarray]:
    """All edges of all polygons as (E,4) [x0,y0,x1,y1] plus an (E,)
    owner index. The owner is assigned PER POLYGON, not per input
    multipolygon: polygons of one multipolygon combine by OR (matching
    points_in_multipolygon / rect_union), so two overlapping polygons
    inside one member must not cancel each other's parity. Holes are
    rings of their polygon, so even-odd per polygon still carves them
    out."""
    segs, owner = [], []
    k = 0
    for mp in mps:
        for poly in mp:
            for ring in poly:
                a = np.asarray(ring, dtype=np.float64)
                if len(a) < 2:
                    continue
                s = np.column_stack([a[:-1], a[1:]])
                segs.append(s)
                owner.append(np.full(len(s), k))
            k += 1
    if not segs:
        return np.zeros((0, 4)), np.zeros((0,), dtype=int)
    return np.vstack(segs), np.concatenate(owner)


def _crossing_ys(segs: np.ndarray) -> np.ndarray:
    """y-coordinates of pairwise proper segment crossings (O(E²) —
    component-local)."""
    e = len(segs)
    if e < 2:
        return np.zeros(0)
    x0, y0, x1, y1 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    ys = []
    for i in range(e - 1):
        # vectorized segment-intersection of edge i vs edges i+1..
        dx1, dy1 = x1[i] - x0[i], y1[i] - y0[i]
        dx2, dy2 = x1[i + 1:] - x0[i + 1:], y1[i + 1:] - y0[i + 1:]
        denom = dx1 * dy2 - dy1 * dx2
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((x0[i + 1:] - x0[i]) * dy2 - (y0[i + 1:] - y0[i]) * dx2) / denom
            u = ((x0[i + 1:] - x0[i]) * dy1 - (y0[i + 1:] - y0[i]) * dx1) / denom
        ok = (denom != 0) & (t > 0) & (t < 1) & (u > 0) & (u < 1)
        if ok.any():
            ys.append(y0[i] + t[ok] * dy1)
    return np.concatenate(ys) if ys else np.zeros(0)


def union_area(mps: list[MultiPolygon]) -> float:
    """Exact area of the boolean union of the given multipolygons."""
    segs, owner = _edges_of(mps)
    if len(segs) == 0:
        return 0.0
    # slab boundaries: every vertex y + every proper crossing y
    ys = np.unique(np.concatenate([segs[:, 1], segs[:, 3], _crossing_ys(segs)]))
    n_poly = int(owner.max()) + 1
    total = 0.0
    x0, y0, x1, y1 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    ylo_e, yhi_e = np.minimum(y0, y1), np.maximum(y0, y1)
    for ylo, yhi in zip(ys[:-1], ys[1:]):
        if yhi <= ylo:
            continue
        ym = 0.5 * (ylo + yhi)
        act = (ylo_e <= ylo) & (yhi_e >= yhi) & (ylo_e < yhi_e)  # spans the slab
        if not act.any():
            continue
        idx = np.nonzero(act)[0]
        # x of each active edge at ylo/ym/yhi (edges are non-vertical in y here)
        t_lo = (ylo - y0[idx]) / (y1[idx] - y0[idx])
        t_hi = (yhi - y0[idx]) / (y1[idx] - y0[idx])
        xm = x0[idx] + 0.5 * (t_lo + t_hi) * (x1[idx] - x0[idx])
        xlo = x0[idx] + t_lo * (x1[idx] - x0[idx])
        xhi = x0[idx] + t_hi * (x1[idx] - x0[idx])
        order = np.argsort(xm, kind="stable")
        parity = np.zeros(n_poly, dtype=bool)
        cover = 0
        left_lo = left_hi = 0.0
        for j in order:
            p = owner[idx[j]]
            before = cover
            parity[p] = ~parity[p]
            cover += 1 if parity[p] else -1
            if before == 0 and cover > 0:       # union interval opens
                left_lo, left_hi = xlo[j], xhi[j]
            elif before > 0 and cover == 0:     # union interval closes
                total += 0.5 * ((xlo[j] - left_lo) + (xhi[j] - left_hi)) * (yhi - ylo)
    return float(total)


# --------------------------------------------------------- geometry

def is_rectilinear(mp: MultiPolygon, tol: float = 0.0) -> bool:
    """True iff every edge is axis-parallel."""
    for poly in mp:
        for ring in poly:
            a = np.asarray(ring, dtype=np.float64)
            if len(a) < 2:
                continue
            dx = np.abs(np.diff(a[:, 0]))
            dy = np.abs(np.diff(a[:, 1]))
            if not np.all((dx <= tol) | (dy <= tol)):
                return False
    return True


def rect_union(mps: list[MultiPolygon]) -> MultiPolygon:
    """True boolean union for rectilinear multipolygons: compress all
    distinct x/y coordinates into a grid, mark cells whose center is
    inside any input (even-odd per polygon), trace exact boundaries
    with the rectilinear vectorizer, then map grid coords back to CRS.

    Exact: every input edge lies on a grid line, so cells are either
    fully inside or fully outside the union."""
    from georip_spark.geo import kernels
    from georip_spark.operators.rastervec import vectorize_mask

    xs_all, ys_all = [], []
    for mp in mps:
        for poly in mp:
            for ring in poly:
                a = np.asarray(ring, dtype=np.float64)
                xs_all.append(a[:, 0])
                ys_all.append(a[:, 1])
    if not xs_all:
        return []
    xs = np.unique(np.concatenate(xs_all))
    ys = np.unique(np.concatenate(ys_all))
    if len(xs) < 2 or len(ys) < 2:
        return []
    cx = 0.5 * (xs[:-1] + xs[1:])
    cy = 0.5 * (ys[:-1] + ys[1:])
    gx, gy = np.meshgrid(cx, cy)          # (ny-1, nx-1)
    flat_x, flat_y = gx.ravel(), gy.ravel()
    covered = np.zeros(flat_x.shape, dtype=bool)
    for mp in mps:
        covered |= kernels.points_in_multipolygon(flat_x, flat_y, mp)
    # vectorize_mask walks pixel-space with row 0 at top; feed rows in
    # DESCENDING y so "up" in mask space is +y, then map back.
    mask = covered.reshape(len(cy), len(cx))[::-1, :].astype(np.uint8)
    rings_px = vectorize_mask(mask)
    ny = len(ys)
    out = []
    for poly in rings_px:
        mapped = []
        for ring in poly:
            c = np.clip(ring[:, 0].astype(int), 0, len(xs) - 1)
            r = np.clip(ring[:, 1].astype(int), 0, ny - 1)
            mapped.append(np.column_stack([xs[c], ys[ny - 1 - r]]))
        out.append(mapped)
    return out
