"""Property-based tests (hypothesis) for the numpy geometry kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from georip_spark.geo import cells, kernels, wkt
from georip_spark.operators import rastervec

coord = st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64)


def rect_poly(minx, miny, w, h):
    ring = np.array(
        [[minx, miny], [minx + w, miny], [minx + w, miny + h], [minx, miny + h], [minx, miny]]
    )
    return [[ring]]


@st.composite
def convex_polygon(draw):
    """Random convex polygon via sorted angles around a center."""
    cx = draw(st.floats(-1000, 1000, allow_nan=False))
    cy = draw(st.floats(-1000, 1000, allow_nan=False))
    n = draw(st.integers(3, 10))
    angles = sorted(draw(st.lists(st.floats(0, 2 * np.pi - 0.01), min_size=n, max_size=n, unique=True)))
    if len(angles) < 3:
        angles = [0.1, 2.0, 4.0]
    r = draw(st.floats(1.0, 500.0))
    pts = np.array([[cx + r * np.cos(a), cy + r * np.sin(a)] for a in angles])
    ring = np.vstack([pts, pts[:1]])
    return [[ring]]


class TestClipProperties:
    @given(convex_polygon(), coord, coord,
           st.floats(0.1, 2000), st.floats(0.1, 2000))
    @settings(max_examples=200, deadline=None)
    def test_clip_area_bounded(self, mp, minx, miny, w, h):
        maxx, maxy = minx + w, miny + h
        clipped = kernels.clip_multipolygon_to_rect(mp, minx, miny, maxx, maxy)
        a_clip = kernels.multipolygon_area(clipped)
        assert a_clip <= kernels.multipolygon_area(mp) + 1e-6
        assert a_clip <= w * h + 1e-6
        if clipped:
            b = kernels.bounds(clipped)
            assert b[0] >= minx - 1e-9 and b[2] <= maxx + 1e-9
            assert b[1] >= miny - 1e-9 and b[3] <= maxy + 1e-9

    @given(convex_polygon(), coord, coord,
           st.floats(0.1, 2000), st.floats(0.1, 2000))
    @settings(max_examples=200, deadline=None)
    def test_clip_nonempty_iff_area_overlap(self, mp, minx, miny, w, h):
        """Non-empty clip ⇒ intersects; intersects with interior
        overlap ⇒ non-empty clip."""
        maxx, maxy = minx + w, miny + h
        clipped = kernels.clip_multipolygon_to_rect(mp, minx, miny, maxx, maxy)
        if kernels.multipolygon_area(clipped) > 1e-9:
            assert kernels.rect_intersects_multipolygon(mp, minx, miny, maxx, maxy)

    @given(convex_polygon())
    @settings(max_examples=100, deadline=None)
    def test_clip_to_own_bounds_is_identity_area(self, mp):
        b = kernels.bounds(mp)
        clipped = kernels.clip_multipolygon_to_rect(mp, *b)
        assert abs(kernels.multipolygon_area(clipped) - kernels.multipolygon_area(mp)) < 1e-6


class TestWktRoundtrip:
    @given(convex_polygon())
    @settings(max_examples=100, deadline=None)
    def test_roundtrip_preserves_area(self, mp):
        rt = wkt.parse_wkt(wkt.to_wkt(mp))
        assert abs(kernels.multipolygon_area(rt) - kernels.multipolygon_area(mp)) < 1e-3


class TestCellProperties:
    @given(st.integers(0, 15),
           st.integers(-(2 ** 27), 2 ** 27 - 1),
           st.integers(-(2 ** 27), 2 ** 27 - 1))
    @settings(max_examples=300, deadline=None)
    def test_pack_unpack(self, res, ix, iy):
        r, x, y = cells.unpack(cells.pack(res, ix, iy))
        assert (int(r), int(x), int(y)) == (res, ix, iy)

    @given(coord, coord, st.integers(4, 14))
    @settings(max_examples=300, deadline=None)
    def test_point_cell_in_own_bbox_cover(self, x, y, res):
        c = int(cells.cell_of(np.array([x]), np.array([y]), res)[0])
        cover = cells.cover_bbox(x, y, x, y, res)
        assert c in set(cover.tolist())

    @given(coord, coord, st.floats(0, 1e4), st.floats(0, 1e4), st.integers(6, 12))
    @settings(max_examples=100, deadline=None)
    def test_cover_contains_corner_cells(self, minx, miny, w, h, res):
        maxx, maxy = minx + w, miny + h
        cover = set(cells.cover_bbox(minx, miny, maxx, maxy, res).tolist())
        for px, py in ((minx, miny), (maxx, maxy), (minx, maxy), (maxx, miny)):
            assert int(cells.cell_of(np.array([px]), np.array([py]), res)[0]) in cover


class TestTileGridProperties:
    @given(st.integers(1, 512), st.integers(1, 512), st.integers(8, 128))
    @settings(max_examples=100, deadline=None)
    def test_stride_eq_size_partitions_raster(self, width, height, tile):
        """stride == tile_size ⇒ tiles tile the raster exactly
        (reference loop semantics, clamped edges)."""
        total = 0
        cover = np.zeros((height, width), dtype=np.int32)
        for row in range(0, height, tile):
            for col in range(0, width, tile):
                tw = min(tile, width - col)
                th = min(tile, height - row)
                total += tw * th
                cover[row:row + th, col:col + tw] += 1
        assert total == width * height
        assert (cover == 1).all()


class TestRasterizeProperties:
    @given(st.integers(0, 10), st.integers(0, 10), st.integers(1, 14), st.integers(1, 14))
    @settings(max_examples=100, deadline=None)
    def test_rect_rasterize_exact(self, x0, y0, w, h):
        mp = rect_poly(float(x0), float(y0), float(w), float(h))
        mask = rastervec.rasterize_multipolygon(mp, 32, 32)
        expected = min(w, 32 - x0) * min(h, 32 - y0)
        assert int(mask.sum()) == max(0, expected)

    @given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11),
                              st.integers(1, 5), st.integers(1, 5)),
                    min_size=1, max_size=4))
    @settings(max_examples=100, deadline=None)
    def test_vectorize_rasterize_roundtrip(self, rects):
        mask = np.zeros((16, 16), dtype=np.uint8)
        for x, y, w, h in rects:
            mask[y:y + h, x:x + w] = 1
        mp = rastervec.vectorize_mask(mask)
        back = rastervec.rasterize_multipolygon(mp, 16, 16)
        assert (back == mask).all()
