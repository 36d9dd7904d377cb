"""Hierarchical planar grid index (H3/S2-style API, dependency-free).

The reference does spatial matching by O(n·m) nested loops of shapely
``intersects`` calls (georip/geoprocessing/mapping.py:117,
georip/utils/pandas.py:118-127). At 10^12 docs that is impossible; the
engine instead assigns both join sides to discrete grid cells and
equi-joins on the cell id — Spark then gets a hash/sort-merge join it
can plan, broadcast, and skew-split.

Cell scheme
-----------
A cell at resolution ``r`` is the square ``[ix*s, (ix+1)*s) ×
[iy*s, (iy+1)*s)`` with ``s = BASE_CELL_SIZE / 2**r``. The id packs
(r, ix, iy) into one int64:

    id = r << 58 | (ix + OFFSET) << 29 | (iy + OFFSET)

29 bits per axis (OFFSET = 2^28 re-centers negatives) ⇒ ±2.6e8 cells
per axis per resolution — ample for any CRS extent we index.

API mirrors h3: cell_of / cover_bbox / grid_disk / parent, so a real
h3 wheel could be dropped in without touching call sites.

Spark-side: for the hot path (billions of tile footprints) cell
assignment is **pure column math** (``cell_expr``), JVM-side inside
whole-stage codegen. The numpy forms exist for the pandas-UDF oracle
and for polygon covers (small dim side).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

BASE_CELL_SIZE = 2.0**20  # world cell at r=0: ~1e6 CRS units
OFFSET = 1 << 28
_AXIS_BITS = 29
_AXIS_MASK = (1 << _AXIS_BITS) - 1


def cell_size(res: int) -> float:
    return BASE_CELL_SIZE / (1 << res)


def pack(res: int, ix, iy):
    """Vectorized (res, ix, iy) → int64 id."""
    ix = np.asarray(ix, dtype=np.int64) + OFFSET
    iy = np.asarray(iy, dtype=np.int64) + OFFSET
    return (np.int64(res) << np.int64(2 * _AXIS_BITS)) | (ix << np.int64(_AXIS_BITS)) | iy


def unpack(cell) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> np.int64(2 * _AXIS_BITS)
    ix = ((cell >> np.int64(_AXIS_BITS)) & _AXIS_MASK) - OFFSET
    iy = (cell & _AXIS_MASK) - OFFSET
    return res, ix, iy


def cell_of(x, y, res: int):
    """Vectorized point → cell id."""
    s = cell_size(res)
    ix = np.floor(np.asarray(x, dtype=np.float64) / s).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / s).astype(np.int64)
    return pack(res, ix, iy)


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """All cells overlapping the (closed) bbox. Touching the max edge
    includes the next cell — matches `.intersects` boundary semantics."""
    s = cell_size(res)
    ix0 = int(np.floor(minx / s))
    ix1 = int(np.floor(maxx / s))
    iy0 = int(np.floor(miny / s))
    iy1 = int(np.floor(maxy / s))
    ixs, iys = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.int64),
        np.arange(iy0, iy1 + 1, dtype=np.int64),
        indexing="ij",
    )
    return pack(res, ixs.ravel(), iys.ravel())


def grid_disk(cell: int, k: int) -> np.ndarray:
    """Cells within Chebyshev distance k (h3 gridDisk analog) —
    the kNN candidate-ring generator (SURVEY.md J12)."""
    res, ix, iy = unpack(np.asarray([cell]))
    dxs, dys = np.meshgrid(
        np.arange(-k, k + 1, dtype=np.int64),
        np.arange(-k, k + 1, dtype=np.int64),
        indexing="ij",
    )
    return pack(int(res[0]), int(ix[0]) + dxs.ravel(), int(iy[0]) + dys.ravel())


def parent(cell, levels: int = 1):
    res, ix, iy = unpack(cell)
    return pack(int(np.asarray(res).ravel()[0]) - levels, ix >> levels, iy >> levels)


# ----------------------------------------------------- Spark column math


def cell_expr(x: Column, y: Column, res: int) -> Column:
    """Point → cell id as a pure Catalyst expression (codegen'd,
    JVM-side — the hot path never touches Python)."""
    s = float(cell_size(res))
    ix = F.floor(x / F.lit(s)).cast("long") + F.lit(OFFSET)
    iy = F.floor(y / F.lit(s)).cast("long") + F.lit(OFFSET)
    return (
        F.lit(np.int64(res) << (2 * _AXIS_BITS)).cast("long")
        + F.shiftleft(ix, _AXIS_BITS)
        + iy
    ).alias("cell")


def cell_from_ixy_expr(ix: Column, iy: Column, res: int) -> Column:
    """(ix, iy) cell indices → packed cell id, pure codegen'd math."""
    base = F.lit(np.int64(res) << (2 * _AXIS_BITS)).cast("long")
    return base + F.shiftleft(ix + F.lit(OFFSET), _AXIS_BITS) + iy + F.lit(OFFSET)


def cover_bbox_expr(minx: Column, miny: Column, maxx: Column, maxy: Column, res: int) -> Column:
    """Bbox → array<cell> as column math, for exploding tile
    footprints into their covering cells JVM-side.

    Shape: ONE flat ``sequence(0, nx·ny−1)`` with div/mod index math
    instead of the round-1 nested ``sequence × sequence + flatten`` —
    the nested form allocated an inner array per x-column plus the
    flattened copy PER ROW, and on a 3.4M-tile probe that allocation
    churn measured ~2.5s of the hot fan-out stage (round 6; this VM
    punishes allocation-heavy interpreted expressions — the jvmalloc
    scaling control). Cell order (x-major, then y) is unchanged, and
    the numpy mirror ``cover_bbox`` stays bit-identical."""
    s = float(cell_size(res))
    ix0 = F.floor(minx / F.lit(s)).cast("long")
    ix1 = F.floor(maxx / F.lit(s)).cast("long")
    iy0 = F.floor(miny / F.lit(s)).cast("long")
    iy1 = F.floor(maxy / F.lit(s)).cast("long")
    ny = iy1 - iy0 + F.lit(1)
    n = (ix1 - ix0 + F.lit(1)) * ny
    base = F.lit(np.int64(res) << (2 * _AXIS_BITS)).cast("long")
    return F.transform(
        F.sequence(F.lit(0).cast("long"), n - 1),
        lambda i: base
        + F.shiftleft(ix0 + ((i - (i % ny)) / ny).cast("long") + F.lit(OFFSET), _AXIS_BITS)
        + iy0
        + (i % ny)
        + F.lit(OFFSET),
    )
