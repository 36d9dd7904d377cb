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
