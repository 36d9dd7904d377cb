"""Boolean-union kernel tests (geo/boolean.py — the A7 unary_union
parity upgrade). Pure numpy; no SparkSession needed.

Cross-checks union_area (slab decomposition, general polygons)
against an INDEPENDENT exact method for rectilinear inputs
(coordinate-compression coverage) and against analytic values for
non-rectilinear cases; checks rect_union geometry against both.
"""

from __future__ import annotations

import numpy as np
import pytest

from georip_spark.geo import boolean, kernels
from georip_spark.geo import wkt as W


def rect(x0, y0, x1, y1):
    return [
        [np.asarray(
            [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
        )]
    ]


def compression_area(rects):
    """Independent exact union area for axis-aligned rects."""
    xs = sorted({r[0][0][0, 0] for r in rects} | {r[0][0][1, 0] for r in rects})
    ys = sorted({r[0][0][0, 1] for r in rects} | {r[0][0][2, 1] for r in rects})
    total = 0.0
    for i in range(len(xs) - 1):
        for j in range(len(ys) - 1):
            cx, cy = (xs[i] + xs[i + 1]) / 2, (ys[j] + ys[j + 1]) / 2
            for r in rects:
                ring = r[0][0]
                if ring[0, 0] <= cx <= ring[1, 0] and ring[0, 1] <= cy <= ring[2, 1]:
                    total += (xs[i + 1] - xs[i]) * (ys[j + 1] - ys[j])
                    break
    return total


class TestUnionArea:
    def test_two_overlapping_rects(self):
        a, b = rect(0, 0, 10, 10), rect(5, 5, 15, 15)
        assert boolean.union_area([a, b]) == pytest.approx(100 + 100 - 25)

    def test_disjoint(self):
        a, b = rect(0, 0, 1, 1), rect(5, 5, 6, 6)
        assert boolean.union_area([a, b]) == pytest.approx(2.0)

    def test_nested(self):
        a, b = rect(0, 0, 10, 10), rect(2, 2, 4, 4)
        assert boolean.union_area([a, b]) == pytest.approx(100.0)

    def test_identical_duplicates(self):
        a = rect(0, 0, 7, 3)
        assert boolean.union_area([a, a, a]) == pytest.approx(21.0)

    def test_overlap_within_one_member(self):
        # two overlapping polygons INSIDE one multipolygon member must
        # combine by OR, not cancel by shared even-odd parity — this is
        # exactly the shape dissolve's non-rectilinear fallback emits
        # (member-assembly MultiPolygons with overlapping polygons)
        a = rect(0, 0, 2, 2)[0][0]
        b = rect(1, 1, 3, 3)[0][0]
        one_member = [[[a], [b]]]
        two_members = [[[a]], [[b]]]
        assert boolean.union_area(one_member) == pytest.approx(7.0)
        assert boolean.union_area(one_member) == pytest.approx(
            boolean.union_area(two_members)
        )

    def test_hole_within_one_member_still_carved(self):
        outer = rect(0, 0, 4, 4)[0][0]
        hole = rect(1, 1, 3, 3)[0][0]
        assert boolean.union_area([[[outer, hole]]]) == pytest.approx(12.0)

    def test_triangles_crossing(self):
        # two triangles forming a star-of-David-ish overlap; area by
        # inclusion-exclusion: each 0.5*8*8=32; intersection is the
        # rhombus between them — computed independently at 4.0 below
        t1 = [[np.asarray([[0, 0], [8, 0], [4, 8], [0, 0]], dtype=np.float64)]]
        t2 = [[np.asarray([[0, 4], [8, 4], [4, -4], [0, 4]], dtype=np.float64)]]
        got = boolean.union_area([t1, t2])
        # overlap of t1 (above y=0) with t2 (below y=4): hexagon-free
        # region; verify against fine-grid sampling of the union
        xs = np.linspace(-0.005, 8.005, 801)
        ys = np.linspace(-4.005, 8.005, 1201)
        gx, gy = np.meshgrid(0.5 * (xs[:-1] + xs[1:]), 0.5 * (ys[:-1] + ys[1:]))
        fx, fy = gx.ravel(), gy.ravel()
        cov = kernels.points_in_multipolygon(fx, fy, t1) | \
            kernels.points_in_multipolygon(fx, fy, t2)
        approx = cov.sum() * (xs[1] - xs[0]) * (ys[1] - ys[0])
        assert got == pytest.approx(approx, rel=0.01)

    def test_polygon_with_hole(self):
        outer = np.asarray([[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]], dtype=np.float64)
        hole = np.asarray([[4, 4], [6, 4], [6, 6], [4, 6], [4, 4]], dtype=np.float64)
        donut = [[outer, hole]]
        assert boolean.union_area([donut]) == pytest.approx(96.0)
        # union with a rect covering the hole fills it
        assert boolean.union_area([donut, rect(3, 3, 7, 7)]) == pytest.approx(100.0)

    def test_random_rect_sets_match_compression(self):
        rng = np.random.default_rng(7)
        for _ in range(10):
            rects = []
            for _ in range(8):
                x0, y0 = rng.integers(0, 50, 2)
                w, h = rng.integers(1, 20, 2)
                rects.append(rect(float(x0), float(y0), float(x0 + w), float(y0 + h)))
            assert boolean.union_area(rects) == pytest.approx(
                compression_area(rects)
            ), [r[0][0][:3] for r in rects]


class TestRectUnion:
    def test_two_overlapping(self):
        a, b = rect(0, 0, 10, 10), rect(5, 5, 15, 15)
        merged = boolean.rect_union([a, b])
        assert len(merged) == 1  # one connected polygon, boundary rewritten
        assert kernels.multipolygon_area(merged) == pytest.approx(175.0)
        wkt_str = W.to_wkt(merged)
        assert wkt_str.startswith("POLYGON")

    def test_disjoint_stays_multi(self):
        a, b = rect(0, 0, 1, 1), rect(5, 5, 6, 6)
        merged = boolean.rect_union([a, b])
        assert len(merged) == 2
        assert kernels.multipolygon_area(merged) == pytest.approx(2.0)

    def test_frame_creates_hole(self):
        # four rects forming a square frame: union must contain a hole
        frame = [
            rect(0, 0, 10, 2), rect(0, 8, 10, 10),
            rect(0, 0, 2, 10), rect(8, 0, 10, 10),
        ]
        merged = boolean.rect_union(frame)
        assert len(merged) == 1
        assert len(merged[0]) == 2  # shell + hole
        assert kernels.multipolygon_area(merged) == pytest.approx(100 - 36)
        assert boolean.union_area(frame) == pytest.approx(100 - 36)

    def test_geometry_area_equals_union_area_random(self):
        rng = np.random.default_rng(11)
        for _ in range(10):
            rects = []
            for _ in range(6):
                x0, y0 = rng.integers(0, 40, 2)
                w, h = rng.integers(1, 15, 2)
                rects.append(rect(float(x0), float(y0), float(x0 + w), float(y0 + h)))
            merged = boolean.rect_union(rects)
            assert kernels.multipolygon_area(merged) == pytest.approx(
                boolean.union_area(rects)
            )

    def test_is_rectilinear(self):
        assert boolean.is_rectilinear(rect(0, 0, 3, 3))
        tri = [[np.asarray([[0, 0], [4, 0], [2, 3], [0, 0]], dtype=np.float64)]]
        assert not boolean.is_rectilinear(tri)


def tri(pts):
    a = np.asarray(pts + [pts[0]], dtype=np.float64)
    if kernels.ring_area(a) < 0:
        a = a[::-1]
    return [[a]]


class TestUnionGeometry:
    """geo/boolean.union_geometry — true boundary union for
    NON-rectilinear components (the round-2 'What's missing #1')."""

    def test_two_rects_vertex_set(self):
        # axis rects through the general path: boundary must be the
        # exact 8-vertex union outline, not a MultiPolygon assembly
        g = boolean.union_geometry([rect(0, 0, 2, 2), rect(1, 1, 3, 3)])
        assert len(g) == 1 and len(g[0]) == 1
        verts = {tuple(p) for p in g[0][0][:-1]}
        assert verts == {
            (0, 0), (2, 0), (2, 1), (3, 1), (3, 3), (1, 3), (1, 2), (0, 2)
        }
        assert kernels.multipolygon_area(g) == pytest.approx(7.0)

    def test_overlapping_triangles_exact(self):
        t1, t2 = tri([(0, 0), (4, 0), (2, 4)]), tri([(2, 0), (6, 0), (4, 4)])
        g = boolean.union_geometry([t1, t2])
        assert len(g) == 1
        assert kernels.multipolygon_area(g) == pytest.approx(
            boolean.union_area([t1, t2])
        )
        # exact vertex set: outer corners + the genuine crossing of
        # (4,0)-(2,4) with (2,0)-(4,4) at (3,2); the collinear bottom
        # points (2,0),(4,0) must be simplified away
        verts = {(round(x, 6), round(y, 6)) for x, y in g[0][0][:-1]}
        assert verts == {(0.0, 0.0), (6.0, 0.0), (4.0, 4.0), (3.0, 2.0), (2.0, 4.0)}

    def test_disjoint_and_nested(self):
        g = boolean.union_geometry([rect(0, 0, 1, 1), rect(5, 5, 6, 6)])
        assert len(g) == 2
        g = boolean.union_geometry([rect(0, 0, 10, 10), rect(2, 2, 4, 4)])
        assert len(g) == 1
        assert kernels.multipolygon_area(g) == pytest.approx(100.0)

    def test_corner_pinch_splits(self):
        g = boolean.union_geometry([rect(0, 0, 1, 1), rect(1, 1, 2, 2)])
        assert len(g) == 2
        assert kernels.multipolygon_area(g) == pytest.approx(2.0)

    def test_frame_hole_general_path(self):
        frame = [
            rect(0, 0, 10, 2), rect(0, 8, 10, 10),
            rect(0, 0, 2, 10), rect(8, 0, 10, 10),
        ]
        g = boolean.union_geometry(frame)
        assert len(g) == 1 and len(g[0]) == 2
        assert kernels.multipolygon_area(g) == pytest.approx(64.0)

    def test_random_mixed_property(self):
        # area(union_geometry) == union_area and idempotent re-union,
        # over mixed triangles / rects / rotated rects
        rng = np.random.default_rng(7)
        done = 0
        while done < 40:
            mps = []
            for _ in range(rng.integers(2, 6)):
                kind = rng.integers(3)
                cx, cy = rng.uniform(0, 20, 2)
                if kind == 0:
                    a = np.column_stack(
                        [cx + rng.uniform(-4, 4, 3), cy + rng.uniform(-4, 4, 3)]
                    )
                    r = np.vstack([a, a[:1]])
                    if abs(kernels.ring_area(r)) < 0.5:
                        continue
                    mps.append(tri([tuple(p) for p in a]))
                elif kind == 1:
                    w, h = rng.uniform(1, 6, 2)
                    mps.append(rect(cx, cy, cx + w, cy + h))
                else:
                    w, h = rng.uniform(1, 5, 2)
                    th = rng.uniform(0, np.pi)
                    c, s = np.cos(th), np.sin(th)
                    base = np.array(
                        [[-w, -h], [w, -h], [w, h], [-w, h], [-w, -h]], float
                    )
                    mps.append([[np.column_stack([
                        cx + base[:, 0] * c - base[:, 1] * s,
                        cy + base[:, 0] * s + base[:, 1] * c,
                    ])]])
            if len(mps) < 2:
                continue
            done += 1
            want = boolean.union_area(mps)
            g = boolean.union_geometry(mps)
            assert kernels.multipolygon_area(g) == pytest.approx(want, rel=1e-6)
            g2 = boolean.union_geometry([g])
            assert kernels.multipolygon_area(g2) == pytest.approx(want, rel=1e-5)

    def test_dissolve_emits_true_union_for_nonrect(self, spark):
        """VERDICT r2 #4 'done' criterion: a q28-style fixture with
        overlapping NON-rectilinear polygons whose dissolve WKT has
        the exact union area AND the exact expected vertex set."""
        from georip_spark.geo import wkt as W
        from georip_spark.operators.dissolve import dissolve

        rows = [
            ("r", 2019, 2020, "T", "POLYGON ((0 0, 4 0, 2 4, 0 0))"),
            ("r", 2019, 2020, "T", "POLYGON ((2 0, 6 0, 4 4, 2 0))"),
            ("r", 2019, 2020, "T", "POLYGON ((100 0, 101 0, 101 1, 100 1, 100 0))"),
        ]
        df = spark.createDataFrame(
            rows,
            "region string, start_year int, end_year int, class_name string, geometry string",
        )
        out = {r["n_members"]: r for r in dissolve(df, buffer=1.0).collect()}
        # every row must be a TRUE boundary union, flagged as such
        assert all(r["exact_boundary"] for r in out.values())
        merged = W.parse_wkt(out[2]["geometry"])
        assert len(merged) == 1  # ONE polygon, boundary rewritten
        assert out[2]["union_area"] == pytest.approx(14.0)
        assert kernels.multipolygon_area(merged) == pytest.approx(14.0)
        verts = {(round(x, 6), round(y, 6)) for x, y in merged[0][0][:-1]}
        assert verts == {(0.0, 0.0), (6.0, 0.0), (4.0, 4.0), (3.0, 2.0), (2.0, 4.0)}


class TestUnionGeometryRegressions:
    """Seeds from jobs/fallback_sweep.py that tripped the area
    self-check before round 4 — each pins one chaining defect."""

    def _check(self, polys):
        mps = [[[np.asarray(r, dtype=np.float64) for r in poly]
                for poly in mp] for mp in polys]
        want = boolean.union_area(mps)
        g = boolean.union_geometry(mps)  # must not raise
        assert kernels.multipolygon_area(g) == pytest.approx(want, rel=1e-6)

    def test_microslab_zigzag_corner_cut(self):
        """Simplification judged vertices against ORIGINAL neighbors,
        so a degenerate micro-slab zigzag (consecutive near-collinear
        run) was removed wholesale, cutting ~7e-4 of area (sweep seed
        4211213509689363094)."""
        self._check([
            [[[[5.945044308521175, 20.658550648443615],
               [8.387236454900426, 22.63757201561267],
               [5.1434433866907385, 26.640543427181285],
               [2.7012512403114863, 24.66152206001223],
               [5.945044308521175, 20.658550648443615]]]],
            [[[[5.143738108572938, 21.376954728988053],
               [12.565428745203794, 21.376954728988053],
               [12.565428745203794, 27.67271341337168],
               [5.143738108572938, 27.67271341337168],
               [5.143738108572938, 21.376954728988053]]]],
        ])

    def test_quantization_boundary_node_split(self):
        """Two fragment endpoints within tol rounded into ADJACENT
        quantization buckets, splitting one graph node in two — the
        chain dead-ended and a whole face was dropped (sweep seed
        2068004715032406462)."""
        self._check([
            [[[[28.24714521816144, 6.692885517057824],
               [31.036374183999957, 3.524256130290243],
               [32.04975723672073, 4.136404023190759],
               [28.24714521816144, 6.692885517057824]]]],
            [[[[21.14932282387853, 6.555912331376181],
               [30.973167993419903, 6.556998610440715],
               [30.97305316195529, 7.595485465088068],
               [21.149207992413917, 7.594399186023534],
               [21.14932282387853, 6.555912331376181]]]],
            [[[[12.402390699972477, 0.5983401614583816],
               [15.414908000148964, 0.5983401614583816],
               [15.414908000148964, 2.1113570703316373],
               [12.402390699972477, 2.1113570703316373],
               [12.402390699972477, 0.5983401614583816]]]],
            [[[[27.02049405245912, 11.131396083013453],
               [28.783899164094112, 13.957680574726353],
               [24.853806583636526, 16.811142370496995],
               [27.02049405245912, 11.131396083013453]]]],
            [[[[22.600963393921525, 24.751513951110617],
               [25.392683675488904, 25.727029194525457],
               [22.199926384705087, 34.86403176108903],
               [19.408206103137708, 33.88851651767419],
               [22.600963393921525, 24.751513951110617]]]],
            [[[[15.833398134481248, 1.1987105987921418],
               [19.006850339824247, 1.8745207959327908],
               [18.364088348734036, 2.002835786274465],
               [15.833398134481248, 1.1987105987921418]]]],
            [[[[21.147955137146226, 17.043073539280286],
               [22.85799764788395, 14.99057577901047],
               [23.503735708214503, 21.98105126609962],
               [21.147955137146226, 17.043073539280286]]]],
            [[[[34.13784548145668, 8.542228310649573],
               [25.80274335398958, 9.121508614788514],
               [25.697565580734658, 7.608135079807943],
               [34.03266770820176, 7.028854775669002],
               [34.13784548145668, 8.542228310649573]]]],
        ])
