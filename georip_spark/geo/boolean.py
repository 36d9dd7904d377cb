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

def _slab_decomposition(mps: list[MultiPolygon], snap_tol: float = 0.0):
    """Shared core of union_area / union_geometry: per-slab union
    coverage intervals. Returns (ys, slabs) where slabs is a list of
    (ylo, yhi, intervals) and each interval is (lxlo, lxhi, rxlo,
    rxhi): the left boundary's x at ylo/yhi and the right boundary's
    x at ylo/yhi. Interval x-values interpolate input edges, so two
    slabs sharing a y compute bit-identical x for a continuing edge.

    snap_tol > 0 clusters slab boundaries closer than the tolerance
    (re-unioning noisy output would otherwise spawn 1e-15-tall slabs)
    and admits edges that fall short of a slab by ≤ tol; exact inputs
    are untouched (singleton clusters keep their exact value)."""
    segs, owner = _edges_of(mps)
    if len(segs) == 0:
        return np.zeros(0), []
    ys = np.unique(np.concatenate([segs[:, 1], segs[:, 3], _crossing_ys(segs)]))
    if snap_tol > 0.0 and len(ys) > 1:
        keep = [float(ys[0])]
        for v in ys[1:]:
            if v - keep[-1] > snap_tol:
                keep.append(float(v))
        ys = np.asarray(keep)
    n_poly = int(owner.max()) + 1
    x0, y0, x1, y1 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    ylo_e, yhi_e = np.minimum(y0, y1), np.maximum(y0, y1)
    slabs = []
    for ylo, yhi in zip(ys[:-1], ys[1:]):
        if yhi <= ylo:
            continue
        act = (ylo_e <= ylo + snap_tol) & (yhi_e >= yhi - snap_tol) & (ylo_e < yhi_e)
        if not act.any():
            continue
        idx = np.nonzero(act)[0]
        t_lo = np.clip((ylo - y0[idx]) / (y1[idx] - y0[idx]), 0.0, 1.0)
        t_hi = np.clip((yhi - y0[idx]) / (y1[idx] - y0[idx]), 0.0, 1.0)
        xlo = x0[idx] + t_lo * (x1[idx] - x0[idx])
        xhi = x0[idx] + t_hi * (x1[idx] - x0[idx])
        xm = 0.5 * (xlo + xhi)
        order = np.argsort(xm, kind="stable")
        parity = np.zeros(n_poly, dtype=bool)
        cover = 0
        ints = []
        cur = None
        for j in order:
            p = owner[idx[j]]
            before = cover
            parity[p] = ~parity[p]
            cover += 1 if parity[p] else -1
            if before == 0 and cover > 0:
                cur = (xlo[j], xhi[j])
            elif before > 0 and cover == 0:
                ints.append((cur[0], cur[1], xlo[j], xhi[j]))
                cur = None
        if ints:
            slabs.append((float(ylo), float(yhi), ints))
    return ys, slabs


def _subtract_intervals(a: list, b: list, tol: float) -> list:
    """Pieces of intervals in `a` not covered by intervals in `b`
    (1-D set difference, tolerance-merged)."""
    if not a:
        return []
    merged = []
    for lo, hi in sorted(b):
        if merged and lo <= merged[-1][1] + tol:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    out = []
    for lo, hi in a:
        cur = lo
        for mlo, mhi in merged:
            if mhi <= cur + tol:
                continue
            if mlo >= hi - tol:
                break
            if mlo > cur + tol:
                out.append((cur, mlo))
            cur = max(cur, mhi)
        if hi > cur + tol:
            out.append((cur, hi))
    return out


def union_geometry(mps: list[MultiPolygon]) -> MultiPolygon:
    """TRUE boolean union geometry for arbitrary simple polygons —
    the non-rectilinear unary_union parity path (reference:
    /root/reference/georip/utils/pandas.py:163-183).

    Method: the same slab decomposition that makes union_area exact.
    Each slab contributes its union trapezoids; boundary fragments are

    - the trapezoids' left/right sides (pieces of input edges),
      directed interior-left (left sides point down, right sides up),
    - horizontal connectors at slab boundaries where coverage starts
      or stops (bottom sides directed +x, top sides −x), obtained by
      1-D interval subtraction between adjacent slabs.

    Fragments chain into closed rings by endpoint matching (leftmost-
    turn rule at pinch vertices), then collinear vertices introduced
    by slab splitting are removed — so the final vertex set is the
    true union boundary: input vertices + genuine edge crossings.
    CCW rings are shells, CW rings are holes (assigned to the
    smallest containing shell). Exactness caveat: crossing points are
    computed in doubles; slab boundaries closer than 1e-9·scale are
    clustered (a no-op for exact inputs, it absorbs the ULP noise of
    re-unioning this function's own output) and the result is
    self-checked against union_area (raises on chaining loss rather
    than silently dropping a face).
    """
    scale = 1.0
    for mp in mps:
        for poly in mp:
            for ring in poly:
                a = np.asarray(ring, dtype=np.float64)
                if a.size:
                    scale = max(scale, float(np.max(np.abs(a))))
    tol = 1e-9 * scale
    ys, slabs = _slab_decomposition(mps, snap_tol=tol)
    if not slabs:
        return []

    frags = []  # directed (x_from, y_from, x_to, y_to)
    for ylo, yhi, ints in slabs:
        for lxlo, lxhi, rxlo, rxhi in ints:
            if abs(lxhi - lxlo) > tol or (yhi - ylo) > tol:
                frags.append((lxhi, yhi, lxlo, ylo))   # left side: down
                frags.append((rxlo, ylo, rxhi, yhi))   # right side: up
    # horizontal connectors at every slab boundary y
    bottoms: dict[float, list] = {}
    tops: dict[float, list] = {}
    for ylo, yhi, ints in slabs:
        bottoms.setdefault(ylo, []).extend((i[0], i[2]) for i in ints)
        tops.setdefault(yhi, []).extend((i[1], i[3]) for i in ints)
    for y in sorted(set(bottoms) | set(tops)):
        below = tops.get(y, [])
        above = bottoms.get(y, [])
        for lo, hi in _subtract_intervals(above, below, tol):
            frags.append((lo, y, hi, y))               # bottom: +x
        for lo, hi in _subtract_intervals(below, above, tol):
            frags.append((hi, y, lo, y))               # top: -x

    # chain fragments into closed rings (interior on the left)
    import math

    def q(v: float) -> int:
        return int(round(v / tol))

    # Node identity must be tolerance-transitive, not bucket-exact:
    # two endpoints within tol of each other can still round into
    # ADJACENT buckets (the quantization-boundary problem), which
    # splits one graph node in two, dead-ends the chain there, and
    # silently drops a whole face (caught by the area self-check).
    # Resolve every endpoint to the first-registered node within one
    # bucket in each direction instead.
    _nodes: set[tuple] = set()

    def node(x: float, y: float) -> tuple:
        kx, ky = q(x), q(y)
        if (kx, ky) in _nodes:
            return (kx, ky)
        for dx in (0, 1, -1):
            for dy in (0, 1, -1):
                if (kx + dx, ky + dy) in _nodes:
                    return (kx + dx, ky + dy)
        _nodes.add((kx, ky))
        return (kx, ky)

    starts: dict[tuple, list] = {}
    for i, (xa, ya, xb, yb) in enumerate(frags):
        if abs(xa - xb) <= tol and abs(ya - yb) <= tol:
            continue
        starts.setdefault(node(xa, ya), []).append(i)
    used = [False] * len(frags)
    rings = []
    for i0 in range(len(frags)):
        if used[i0]:
            continue
        start_key = node(frags[i0][0], frags[i0][1])
        chain = []
        i = i0
        guard = 0
        while True:
            guard += 1
            if guard > len(frags) + 2:
                chain = None
                break
            used[i] = True
            xa, ya, xb, yb = frags[i]
            chain.append((xa, ya))
            key = node(xb, yb)
            if key == start_key:
                # closed — stopping here (not at fragment exhaustion)
                # also splits figure-eight pinches into separate rings
                break
            cands = [k for k in starts.get(key, []) if not used[k]]
            if not cands:
                chain = None
                break
            if len(cands) == 1:
                i = cands[0]
            else:
                # pinch vertex: leftmost turn keeps faces separate
                ain = math.atan2(yb - ya, xb - xa)
                best, best_turn = None, -10.0
                for k in cands:
                    kx, ky = frags[k][2] - frags[k][0], frags[k][3] - frags[k][1]
                    turn = math.atan2(ky, kx) - ain
                    while turn <= -math.pi:
                        turn += 2 * math.pi
                    while turn > math.pi:
                        turn -= 2 * math.pi
                    if turn > best_turn:
                        best, best_turn = k, turn
                i = best
        if not chain or len(chain) < 3:
            continue
        # drop collinear / duplicate vertices (slab-split artifacts).
        # Each removal decision must use the CURRENT neighbors, not the
        # original ones: judging every vertex against its original
        # neighbors can remove a consecutive run (each member trivially
        # collinear in the unsimplified ring) and cut the corner the
        # run formed — a degenerate micro-slab zigzag lost ~7e-4 area
        # that way, tripping the self-check below (the 0.06% dissolve
        # fallback rate). Doubly-linked ring + requeue-on-removal
        # reaches the fixpoint; every single removal changes area by
        # ≤ |cross|/2 ≤ tol·scale/2, so total drift stays far inside
        # the self-check tolerance.
        n = len(chain)
        nxt = [(j + 1) % n for j in range(n)]
        prv = [(j - 1) % n for j in range(n)]
        alive = [True] * n
        n_alive = n

        def _redundant(j: int) -> bool:
            a, b, c = chain[prv[j]], chain[j], chain[nxt[j]]
            if abs(b[0] - a[0]) <= tol and abs(b[1] - a[1]) <= tol:
                return True
            cross = (b[0] - a[0]) * (c[1] - b[1]) - (b[1] - a[1]) * (c[0] - b[0])
            if abs(cross) <= tol * scale:
                dot = (b[0] - a[0]) * (c[0] - b[0]) + (b[1] - a[1]) * (c[1] - b[1])
                if dot > 0:
                    return True
            return False

        queue = list(range(n))
        while queue and n_alive >= 3:
            j = queue.pop()
            if not alive[j] or not _redundant(j):
                continue
            alive[j] = False
            n_alive -= 1
            a, c = prv[j], nxt[j]
            nxt[a], prv[c] = c, a
            queue.append(a)
            queue.append(c)
        pts = [chain[j] for j in range(n) if alive[j]]
        if len(pts) < 3:
            continue
        ring = np.asarray(pts + [pts[0]], dtype=np.float64)
        rings.append(ring)

    from georip_spark.geo.kernels import points_in_ring, ring_area

    shells = [(r, abs(ring_area(r))) for r in rings if ring_area(r) > 0]
    holes = [r for r in rings if ring_area(r) < 0]
    shells.sort(key=lambda t: t[1])
    out = [[s] for s, _ in shells]
    for h in holes:
        # representative: an edge midpoint — a hole vertex can lie ON
        # a shell at pinch points; the midpoint of a boundary edge is
        # interior to the containing shell. Shells are sorted by area,
        # so the first hit is the smallest container.
        px = np.asarray([0.5 * (h[0, 0] + h[1, 0])])
        py = np.asarray([0.5 * (h[0, 1] + h[1, 1])])
        for si, (s, _) in enumerate(shells):
            if bool(points_in_ring(px, py, s)[0]):
                out[si].append(h)
                break
    # self-check: the traced geometry must carry the exact union area
    # (shells minus holes); a lost or mis-oriented chain fails loudly
    got = sum(
        abs(ring_area(poly[0])) - sum(abs(ring_area(r)) for r in poly[1:])
        for poly in out
    )
    want = union_area(mps)
    if abs(got - want) > 1e-6 * max(1.0, want):
        raise ValueError(
            f"union_geometry: boundary chaining inconsistent "
            f"(traced area {got!r} vs exact union area {want!r})"
        )
    return out

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
    covered = np.zeros((len(cy), len(cx)), dtype=bool)
    # mark coverage per input, windowed to the input's bbox sub-grid:
    # every input edge lies on a grid line, so cells outside the bbox
    # are provably uncovered by that input. For N small polys chained
    # along a tile grid this turns O(N * grid) into ~O(N) total work.
    for mp in mps:
        bminx = min(np.asarray(r, dtype=np.float64)[:, 0].min() for p in mp for r in p[:1])
        bmaxx = max(np.asarray(r, dtype=np.float64)[:, 0].max() for p in mp for r in p[:1])
        bminy = min(np.asarray(r, dtype=np.float64)[:, 1].min() for p in mp for r in p[:1])
        bmaxy = max(np.asarray(r, dtype=np.float64)[:, 1].max() for p in mp for r in p[:1])
        i0 = int(np.searchsorted(cx, bminx, side="left"))
        i1 = int(np.searchsorted(cx, bmaxx, side="right"))
        j0 = int(np.searchsorted(cy, bminy, side="left"))
        j1 = int(np.searchsorted(cy, bmaxy, side="right"))
        if i0 >= i1 or j0 >= j1:
            continue
        gx, gy = np.meshgrid(cx[i0:i1], cy[j0:j1])
        hit = kernels.points_in_multipolygon(gx.ravel(), gy.ravel(), mp)
        covered[j0:j1, i0:i1] |= hit.reshape(j1 - j0, i1 - i0)
    # vectorize_mask walks pixel-space with row 0 at top; feed rows in
    # DESCENDING y so "up" in mask space is +y, then map back.
    mask = covered[::-1, :].astype(np.uint8)
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
