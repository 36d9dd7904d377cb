"""Unit tests for the pure-numpy geometry kernels (no Spark)."""

import numpy as np
import pytest

from georip_spark.geo import cells, kernels, wkt


SQ = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
TRI = "POLYGON ((0 0, 4 0, 0 4, 0 0))"
HOLEY = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
MULTI = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"


class TestWkt:
    def test_roundtrip_polygon(self):
        mp = wkt.parse_wkt(SQ)
        assert len(mp) == 1 and len(mp[0]) == 1 and len(mp[0][0]) == 5
        assert wkt.parse_wkt(wkt.to_wkt(mp))[0][0].tolist() == mp[0][0].tolist()

    def test_roundtrip_multipolygon(self):
        mp = wkt.parse_wkt(MULTI)
        assert len(mp) == 2
        s = wkt.to_wkt(mp)
        assert s.startswith("MULTIPOLYGON")
        assert wkt.parse_wkt(s)[1][0].tolist() == mp[1][0].tolist()

    def test_holes(self):
        mp = wkt.parse_wkt(HOLEY)
        assert len(mp[0]) == 2

    def test_empty(self):
        assert wkt.parse_wkt("POLYGON EMPTY") == []
        assert wkt.parse_wkt(None) == []
        assert wkt.to_wkt([]) == "POLYGON EMPTY"

    def test_z_dropped(self):
        mp = wkt.parse_wkt("POLYGON Z ((0 0 1, 4 0 1, 0 4 1, 0 0 1))")
        assert mp[0][0].shape == (4, 2)

    def test_box(self):
        mp = wkt.parse_wkt(wkt.box_wkt(1, 2, 3, 4))
        assert kernels.bounds(mp) == (1, 2, 3, 4)


class TestArea:
    def test_square(self):
        assert kernels.multipolygon_area(wkt.parse_wkt(SQ)) == 100.0

    def test_triangle(self):
        assert kernels.multipolygon_area(wkt.parse_wkt(TRI)) == 8.0

    def test_hole_subtracted(self):
        assert kernels.multipolygon_area(wkt.parse_wkt(HOLEY)) == 96.0

    def test_multi(self):
        assert kernels.multipolygon_area(wkt.parse_wkt(MULTI)) == 8.0


class TestPIP:
    def test_inside_outside(self):
        mp = wkt.parse_wkt(SQ)
        px = np.array([5.0, 15.0, -1.0, 0.0, 10.0])
        py = np.array([5.0, 5.0, 5.0, 0.0, 10.0])
        got = kernels.points_in_multipolygon(px, py, mp)
        # boundary (corners) count as inside (intersects semantics)
        assert got.tolist() == [True, False, False, True, True]

    def test_hole(self):
        mp = wkt.parse_wkt(HOLEY)
        px = np.array([5.0, 1.0, 4.0])
        py = np.array([5.0, 1.0, 4.0])
        got = kernels.points_in_multipolygon(px, py, mp)
        # center is in the hole → out; hole boundary → in
        assert got.tolist() == [False, True, True]

    def test_concave(self):
        poly = wkt.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))")
        px = np.array([5.0, 5.0])
        py = np.array([2.0, 8.0])
        assert kernels.points_in_multipolygon(px, py, poly).tolist() == [True, False]


class TestClip:
    def test_full_containment(self):
        mp = wkt.parse_wkt(SQ)
        out = kernels.clip_multipolygon_to_rect(mp, -5, -5, 15, 15)
        assert kernels.multipolygon_area(out) == 100.0

    def test_partial(self):
        mp = wkt.parse_wkt(SQ)
        out = kernels.clip_multipolygon_to_rect(mp, 5, 5, 15, 15)
        assert kernels.multipolygon_area(out) == 25.0
        assert kernels.bounds(out) == (5, 5, 10, 10)

    def test_disjoint(self):
        mp = wkt.parse_wkt(SQ)
        assert kernels.clip_multipolygon_to_rect(mp, 20, 20, 30, 30) == []

    def test_triangle_clip(self):
        mp = wkt.parse_wkt(TRI)
        out = kernels.clip_multipolygon_to_rect(mp, 0, 0, 2, 2)
        # triangle x+y<=4 clipped to [0,2]^2 keeps the full 2x2 square
        assert kernels.multipolygon_area(out) == pytest.approx(4.0)

    def test_hole_clip(self):
        mp = wkt.parse_wkt(HOLEY)
        out = kernels.clip_multipolygon_to_rect(mp, 0, 0, 5, 5)
        # 5x5 quadrant minus the 1x1 quarter of the hole
        assert kernels.multipolygon_area(out) == pytest.approx(24.0)

    def test_thin_sliver_survives_at_utm_magnitude(self):
        # ADVICE round 3: the old zero-area floor scaled with the
        # ABSOLUTE coordinate magnitude squared (~m² at UTM northings),
        # silently dropping genuinely small clip intersections. In
        # ring-local coords the floor is near machine epsilon: a
        # 0.001 m × 50 m sliver at northing 5e6 must survive.
        x0, y0 = 500_000.0, 5_000_000.0
        ring = np.array(
            [[x0, y0], [x0 + 50.0, y0], [x0 + 50.0, y0 + 0.001],
             [x0, y0 + 0.001], [x0, y0]]
        )
        out = kernels.clip_ring_to_rect(
            ring, x0 - 10.0, y0 - 10.0, x0 + 100.0, y0 + 100.0
        )
        assert out is not None
        # area asserted in local coords too — absolute-coordinate
        # shoelace rounds at ~eps·m², the very effect under test
        assert abs(kernels.ring_area(out - out[0])) == pytest.approx(0.05, rel=1e-6)

    def test_exact_touch_still_empty_at_utm_magnitude(self):
        # exact-touch intersection (shared edge only) must still
        # collapse to None after the ring-local floor change
        x0, y0 = 500_000.0, 5_000_000.0
        ring = np.array(
            [[x0, y0], [x0 + 50.0, y0], [x0 + 50.0, y0 + 50.0],
             [x0, y0 + 50.0], [x0, y0]]
        )
        out = kernels.clip_ring_to_rect(
            ring, x0 - 100.0, y0 - 100.0, x0 + 50.0, y0
        )
        assert out is None


class TestIntersects:
    def test_basic(self):
        mp = wkt.parse_wkt(SQ)
        assert kernels.rect_intersects_multipolygon(mp, 5, 5, 15, 15)
        assert not kernels.rect_intersects_multipolygon(mp, 11, 11, 15, 15)

    def test_touching_edge(self):
        mp = wkt.parse_wkt(SQ)
        assert kernels.rect_intersects_multipolygon(mp, 10, 0, 20, 10)

    def test_rect_inside_polygon(self):
        mp = wkt.parse_wkt(SQ)
        assert kernels.rect_intersects_multipolygon(mp, 4, 4, 6, 6)

    def test_polygon_inside_rect(self):
        mp = wkt.parse_wkt(TRI)
        assert kernels.rect_intersects_multipolygon(mp, -10, -10, 10, 10)


class TestSparse:
    def test_empty_sparse(self):
        assert kernels.is_sparse_multipolygon([])

    def test_sliver_aspect(self):
        sliver = wkt.parse_wkt("POLYGON ((0 0, 100 0, 100 2, 0 2, 0 0))")
        assert kernels.is_sparse_multipolygon(sliver)  # aspect 50 > 10

    def test_tiny_area(self):
        tiny = wkt.parse_wkt("POLYGON ((0 0, 0.5 0, 0.5 0.5, 0 0.5, 0 0))")
        assert kernels.is_sparse_multipolygon(tiny)  # area 0.25 < 1

    def test_normal_not_sparse(self):
        assert not kernels.is_sparse_multipolygon(wkt.parse_wkt(SQ))

    def test_zero_extent(self):
        line = wkt.parse_wkt("POLYGON ((0 0, 10 0, 10 0, 0 0))")
        assert kernels.is_sparse_multipolygon(line)


class TestSegments:
    def test_bbox(self):
        seg = np.array([1.0, 2.0, 5.0, 8.0, 3.0, 4.0])
        assert kernels.segments_to_bbox(seg) == (1.0, 2.0, 4.0, 6.0)

    def test_negative_raises(self):
        with pytest.raises(ValueError):
            kernels.segments_to_bbox(np.array([-1.0, 2.0, 5.0, 8.0]))


class TestCells:
    def test_pack_unpack_roundtrip(self):
        for res, ix, iy in [(0, 0, 0), (7, -123, 456), (15, 100000, -100000)]:
            r, x, y = cells.unpack(cells.pack(res, ix, iy))
            assert (int(r), int(x), int(y)) == (res, ix, iy)

    def test_cell_of(self):
        res = 10
        s = cells.cell_size(res)
        c = cells.cell_of(np.array([s * 3 + 0.1]), np.array([-s * 2 + 0.1]), res)
        r, ix, iy = cells.unpack(c)
        assert (int(ix[0]), int(iy[0])) == (3, -2)

    def test_cover_bbox(self):
        res = 10
        s = cells.cell_size(res)
        cover = cells.cover_bbox(0.0, 0.0, 2.5 * s, 1.5 * s, res)
        assert len(cover) == 3 * 2

    def test_cover_contains_point_cell(self):
        res = 12
        c = cells.cell_of(np.array([12345.6]), np.array([-789.1]), res)
        cover = cells.cover_bbox(12000.0, -1000.0, 13000.0, 0.0, res)
        assert int(c[0]) in set(cover.tolist())

    def test_grid_disk(self):
        c = int(cells.cell_of(np.array([0.5]), np.array([0.5]), 10)[0])
        disk = cells.grid_disk(c, 1)
        assert len(disk) == 9 and c in set(disk.tolist())

    def test_parent(self):
        c = cells.pack(10, 7, 5)
        p = cells.parent(c, 1)
        r, ix, iy = cells.unpack(p)
        assert (int(r), int(ix), int(iy)) == (9, 3, 2)


class TestBatchIntersects:
    """Vectorized rects_intersect_multipolygon must agree with the
    scalar rect_intersects_multipolygon on randomized cases."""

    def test_matches_scalar(self):
        rng = np.random.default_rng(7)
        polys = [
            wkt.parse_wkt(SQ),
            wkt.parse_wkt(TRI),
            wkt.parse_wkt(HOLEY),
            wkt.parse_wkt(MULTI),
            wkt.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 5 5, 0 10, 0 0))"),
        ]
        for mp in polys:
            minx = rng.uniform(-5, 12, 300)
            miny = rng.uniform(-5, 12, 300)
            w = rng.uniform(0, 6, 300)
            h = rng.uniform(0, 6, 300)
            maxx, maxy = minx + w, miny + h
            got = kernels.rects_intersect_multipolygon(mp, minx, miny, maxx, maxy)
            exp = np.array([
                kernels.rect_intersects_multipolygon(mp, a, b, c, d)
                for a, b, c, d in zip(minx, miny, maxx, maxy)
            ])
            assert (got == exp).all(), f"mismatch at {np.nonzero(got != exp)[0][:5]}"

    def test_degenerate_points(self):
        mp = wkt.parse_wkt(HOLEY)
        px = np.array([5.0, 1.0, 20.0, 4.0])
        py = np.array([5.0, 1.0, 20.0, 4.0])
        got = kernels.rects_intersect_multipolygon(mp, px, py, px, py)
        exp = kernels.points_in_multipolygon(px, py, mp)
        assert (got == exp).all()
