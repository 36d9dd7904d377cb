"""F14 geometry repair + CRS transform tests.

repair: reference chain normalize / remove_repeated_points /
buffer(0) (georip/geometry/polygons.py:297-335). crs: `to_crs`
alignment (georip/geoprocessing/utils.py:425-427) via the numpy
transverse-mercator kernels.
"""

from __future__ import annotations

import numpy as np
import pytest

from georip_spark.geo import crs as C
from georip_spark.geo import kernels, repair
from georip_spark.geo import wkt as W


def ring(*pts):
    return np.asarray(list(pts) + [pts[0]], dtype=np.float64)


class TestRepair:
    def test_dedup_repeated_points(self):
        r = np.asarray(
            [[0, 0], [0, 0], [4, 0], [4, 4], [4, 4], [4, 4], [0, 4], [0, 0]],
            dtype=np.float64,
        )
        out = repair.dedup_ring(r)
        assert len(out) == 5 and np.array_equal(out[0], out[-1])

    def test_degenerate_to_none(self):
        r = np.asarray([[1, 1], [1, 1], [1, 1]], dtype=np.float64)
        assert repair.dedup_ring(r) is None

    def test_bowtie_untwists_to_two_triangles(self):
        bow = ring((0, 0), (1, 1), (1, 0), (0, 1))  # crossing at (.5,.5)
        out = repair.repair_multipolygon([[bow]])
        assert len(out) == 2
        areas = sorted(abs(kernels.ring_area(p[0])) for p in out)
        assert areas == pytest.approx([0.25, 0.25])
        # total repaired area == even-odd area of the original bowtie
        total = sum(kernels.multipolygon_area(p_) for p_ in ([p] for p in out))
        assert total == pytest.approx(0.5)

    def test_simple_ring_unchanged(self):
        sq = ring((0, 0), (4, 0), (4, 4), (0, 4))
        out = repair.repair_multipolygon([[sq]])
        assert len(out) == 1
        assert abs(kernels.ring_area(out[0][0])) == pytest.approx(16.0)

    def test_hole_reattached(self):
        shell = ring((0, 0), (10, 0), (10, 10), (0, 10))
        hole = ring((4, 4), (6, 4), (6, 6), (4, 6))
        out = repair.repair_multipolygon([[shell, hole]])
        assert len(out) == 1 and len(out[0]) == 2
        assert kernels.polygon_area(out[0]) == pytest.approx(96.0)

    def test_orphan_hole_dropped(self):
        shell = ring((0, 0), (2, 0), (2, 2), (0, 2))
        far_hole = ring((40, 40), (41, 40), (41, 41), (40, 41))
        out = repair.repair_multipolygon([[shell, far_hole]])
        assert len(out) == 1 and len(out[0]) == 1

    def test_repair_udf_roundtrip(self, spark):
        from pyspark.sql import functions as F

        from georip_spark.operators.geom_udfs import repair_geometry

        rows = [
            ("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))",),   # bowtie
            ("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",),   # valid
            ("POLYGON EMPTY",),
        ]
        df = spark.createDataFrame(rows, "geometry string")
        got = [r["fixed"] for r in df.select(
            repair_geometry(F.col("geometry")).alias("fixed")).collect()]
        assert got[0].startswith("MULTIPOLYGON")   # two triangles
        assert got[1].startswith("POLYGON")
        assert got[2] == "POLYGON EMPTY"
        # repaired bowtie parses and has the even-odd area
        assert kernels.multipolygon_area(W.parse_wkt(got[0])) == pytest.approx(0.5)


class TestCrs:
    def test_central_meridian_easting(self):
        # on a zone's central meridian the easting is exactly FE=500000
        x, y = C.geographic_to_utm(np.asarray([-123.0]), np.asarray([45.0]), zone=10)
        assert x[0] == pytest.approx(500000.0, abs=1e-6)
        assert 4_900_000 < y[0] < 5_000_000  # ~45°N northing

    def test_roundtrip_zone10(self):
        lons = np.linspace(-125.9, -120.1, 13)
        lats = np.linspace(0.5, 83.0, 13)
        x, y = C.geographic_to_utm(lons, lats, zone=10)
        lon2, lat2 = C.utm_to_geographic(x, y, zone=10)
        assert np.allclose(lons, lon2, atol=1e-9)
        assert np.allclose(lats, lat2, atol=1e-9)

    def test_zone_to_zone_consistency(self):
        # a point in the 32610/32611 overlap area maps consistently:
        # 10→11 then 11→10 returns the original coordinates
        x = np.asarray([700000.0])  # east edge of zone 10 ≈ zone 11 west
        y = np.asarray([4_000_000.0])
        x11, y11 = C.transform_xy(x, y, "EPSG:32610", "EPSG:32611")
        x10, y10 = C.transform_xy(x11, y11, "EPSG:32611", "EPSG:32610")
        # zone 11's representation of this point sits 340 km from its
        # central meridian — the Snyder series is cm-accurate there
        assert x10[0] == pytest.approx(x[0], abs=0.01)
        assert y10[0] == pytest.approx(y[0], abs=0.01)

    def test_southern_hemisphere_false_northing(self):
        x, y = C.geographic_to_utm(
            np.asarray([-123.0]), np.asarray([-10.0]), zone=10, north=False
        )
        assert y[0] > 8_000_000  # false northing applied
        lon, lat = C.utm_to_geographic(x, y, zone=10, north=False)
        assert lat[0] == pytest.approx(-10.0, abs=1e-9)

    def test_parse_epsg(self):
        assert C.parse_epsg_utm("EPSG:32610") == (10, True)
        assert C.parse_epsg_utm("EPSG:32733") == (33, False)
        with pytest.raises(ValueError):
            C.parse_epsg_utm("EPSG:4326")

    def test_align_regions_to_crs(self, spark):
        from georip_spark.pipeline import align_regions_to_crs

        wkt_in = "POLYGON ((700000 4000000, 701000 4000000, 701000 4001000, 700000 4001000, 700000 4000000))"
        df = spark.createDataFrame(
            [("a", wkt_in, "EPSG:32611"), ("b", wkt_in, "EPSG:32610")],
            "name string, geometry string, crs string",
        )
        got = {r["name"]: r for r in align_regions_to_crs(df, "EPSG:32610").collect()}
        assert got["a"]["crs"] == got["b"]["crs"] == "EPSG:32610"
        assert got["b"]["geometry"] == wkt_in          # identity row untouched
        assert got["a"]["geometry"] != wkt_in          # moved row rewritten
        moved = W.parse_wkt(got["a"]["geometry"])[0][0]
        assert moved[0, 0] > 1_000_000                 # zone-11 point seen from zone 10

    def test_transform_geometry_udf(self, spark):
        from pyspark.sql import functions as F

        from georip_spark.operators.geom_udfs import transform_geometry

        wkt_in = "POLYGON ((700000 4000000, 701000 4000000, 701000 4001000, 700000 4001000, 700000 4000000))"
        df = spark.createDataFrame(
            [(wkt_in, "EPSG:32610", "EPSG:32611"), (wkt_in, "EPSG:32610", "EPSG:32610")],
            "geometry string, src string, dst string",
        )
        got = [r["g2"] for r in df.select(
            transform_geometry("geometry", "src", "dst").alias("g2")).collect()]
        moved = W.parse_wkt(got[0])[0][0]
        orig = W.parse_wkt(wkt_in)[0][0]
        # identity path byte-stable
        assert np.allclose(W.parse_wkt(got[1])[0][0], orig)
        # zone 11 easting of a zone-10 point near the boundary is far
        # west of the zone-11 central meridian → much smaller easting
        assert moved[0, 0] < 300000
        # area is nearly preserved (scale distortion ≪ 1%)
        a0 = abs(kernels.ring_area(orig))
        a1 = abs(kernels.ring_area(moved))
        assert a1 == pytest.approx(a0, rel=5e-3)

    def test_transform_geometry_nad27_opt_in(self, spark):
        from pyspark.sql import functions as F

        from georip_spark.operators.geom_udfs import (
            transform_geometry, transform_geometry_approx)
        from georip_spark.pipeline import align_regions_to_crs

        wkt_in = ("POLYGON ((-100 40, -99.99 40, -99.99 40.01, "
                  "-100 40.01, -100 40))")
        df = spark.createDataFrame(
            [("r1", wkt_in, "EPSG:4267")], "rid string, geometry string, crs string"
        )
        # strict UDF refuses the grid-only datum
        with pytest.raises(Exception, match="allow_approx"):
            df.select(transform_geometry(
                "geometry", "crs", F.lit("EPSG:4326"))).collect()
        # approx UDF (and the pipeline flag) accept it and move ~10-100 m
        got = align_regions_to_crs(
            df, "EPSG:4326", allow_approx=True).collect()[0]
        assert got["crs"] == "EPSG:4326"
        moved = W.parse_wkt(got["geometry"])[0][0]
        orig = W.parse_wkt(wkt_in)[0][0]
        d = np.hypot((moved[:, 0] - orig[:, 0]) * 111_000 * np.cos(np.deg2rad(40)),
                     (moved[:, 1] - orig[:, 1]) * 111_000)
        assert np.all(d > 5.0) and np.all(d < 300.0)


class TestWebMercator:
    def test_known_values(self):
        # closed-form reference: x(45°E) = R·π/4, y(45°N) = R·ln(tan 67.5°)
        x, y = C.geographic_to_webmercator(np.asarray([45.0]), np.asarray([45.0]))
        assert x[0] == pytest.approx(5009377.085697311, abs=1e-6)
        assert y[0] == pytest.approx(5621521.486192823, abs=1e-6)
        x0, y0 = C.geographic_to_webmercator(np.asarray([0.0]), np.asarray([0.0]))
        assert x0[0] == 0.0 and y0[0] == pytest.approx(0.0, abs=1e-9)

    def test_roundtrip(self):
        lons = np.linspace(-179.0, 179.0, 23)
        lats = np.linspace(-84.0, 84.0, 23)
        x, y = C.geographic_to_webmercator(lons, lats)
        lon2, lat2 = C.webmercator_to_geographic(x, y)
        assert np.allclose(lons, lon2, atol=1e-12)
        assert np.allclose(lats, lat2, atol=1e-12)

    def test_utm_to_webmercator_roundtrip(self):
        # UTM zone 10 → 3857 → back, through the geographic hub; the
        # only approximation is the Snyder series (1cm tolerance)
        x = np.linspace(400000.0, 600000.0, 9)
        y = np.linspace(3_900_000.0, 5_200_000.0, 9)
        mx, my = C.transform_xy(x, y, "EPSG:32610", "EPSG:3857")
        x2, y2 = C.transform_xy(mx, my, "EPSG:3857", "EPSG:32610")
        assert np.allclose(x, x2, atol=0.01)
        assert np.allclose(y, y2, atol=0.01)

    def test_geographic_passthrough(self):
        lon, lat = C.transform_xy(
            np.asarray([-122.5]), np.asarray([47.0]), "EPSG:4326", "WGS84"
        )
        assert lon[0] == -122.5 and lat[0] == 47.0
        # 4326 → UTM matches the direct call
        xu, yu = C.transform_xy(
            np.asarray([-123.0]), np.asarray([45.0]), "EPSG:4326", "EPSG:32610"
        )
        xd, yd = C.geographic_to_utm(np.asarray([-123.0]), np.asarray([45.0]), 10)
        assert xu[0] == xd[0] and yu[0] == yd[0]

    def test_unsupported_raises(self):
        # a code with no registered decode still raises
        with pytest.raises(ValueError, match="unsupported CRS"):
            C.transform_xy(np.asarray([0.0]), np.asarray([0.0]),
                           "EPSG:2154", "EPSG:3857")

    def test_nad27_requires_explicit_approx_opt_in(self):
        # NAD27's BEST published transform is a distortion grid
        # (NADCON) — by default it must raise, not silently fall back
        # to the ~5 m Helmert
        with pytest.raises(ValueError, match="allow_approx"):
            C.transform_xy(np.asarray([-100.0]), np.asarray([40.0]),
                           "EPSG:4267", "EPSG:3857")

    def test_nad27_helmert_fallback_opt_in(self):
        # With the opt-in: EPSG:1173 geocentric translation. The
        # datum shift in CONUS is tens of metres; the roundtrip
        # through the exact inverse is lossless.
        lon = np.asarray([-100.0, -122.0, -75.0])
        lat = np.asarray([40.0, 37.0, 43.0])
        lon_w, lat_w = C.transform_xy(lon, lat, "EPSG:4267", "EPSG:4326",
                                      allow_approx=True)
        # ~10-100 m shift expected (1 deg lat ≈ 111 km)
        d = np.hypot((lon_w - lon) * 111_000 * np.cos(np.deg2rad(lat)),
                     (lat_w - lat) * 111_000)
        assert np.all(d > 5.0) and np.all(d < 300.0)
        lon2, lat2 = C.transform_xy(lon_w, lat_w, "EPSG:4326", "EPSG:4267",
                                    allow_approx=True)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)

    def test_nad27_utm_is_tm_on_clarke1866(self):
        # NAD27 / UTM 14N projection = the TM kernel on Clarke 1866.
        # Same-datum, so EXACT — no allow_approx needed (the gate only
        # fires on actual datum shifts crossing NAD27)
        lon = np.asarray([-99.0])
        lat = np.asarray([35.0])
        e, n = C.transform_xy(lon, lat, "EPSG:4267", "EPSG:26714")
        a, f = C._ELLIPSOIDS["clarke1866"]
        ed, nd = C.tm_forward(lon, lat, a=a, f=f, k0=0.9996, lat0=0.0,
                              lon0=-99.0, fe=500000.0, fn=0.0)
        assert abs(e[0] - ed[0]) < 1e-6 and abs(n[0] - nd[0]) < 1e-6

    def test_nad83_aligned_with_wgs84(self):
        # NAD83 ≡ WGS84 at Helmert accuracy (EPSG:1188 is 0/0/0):
        # geographic coords pass through unchanged, and NAD83/UTM vs
        # WGS84/UTM differ only by the GRS80-vs-WGS84 flattening
        # (sub-mm)
        lon = np.asarray([-122.3])
        lat = np.asarray([47.6])
        lon2, lat2 = C.transform_xy(lon, lat, "EPSG:4269", "EPSG:4326")
        np.testing.assert_allclose([lon2[0], lat2[0]], [lon[0], lat[0]],
                                   atol=1e-12)
        e83, n83 = C.transform_xy(lon, lat, "EPSG:4269", "EPSG:26910")
        ew, nw = C.transform_xy(lon, lat, "EPSG:4326", "EPSG:32610")
        assert abs(e83[0] - ew[0]) < 1e-3 and abs(n83[0] - nw[0]) < 1e-3

    def test_pipeline_mixed_3857_and_utm(self, spark):
        """VERDICT r2 #5: regions arriving in EPSG:3857 align onto a
        UTM raster CRS through the same pipeline entry as UTM↔UTM."""
        from georip_spark.pipeline import align_regions_to_crs

        # a ~1km square near Seattle, authored in Web-Mercator metres
        lon0, lat0 = -122.33, 47.60
        mx, my = C.geographic_to_webmercator(
            np.asarray([lon0, lon0 + 0.013]), np.asarray([lat0, lat0 + 0.009])
        )
        wkt_3857 = (
            f"POLYGON (({mx[0]} {my[0]}, {mx[1]} {my[0]}, {mx[1]} {my[1]}, "
            f"{mx[0]} {my[1]}, {mx[0]} {my[0]}))"
        )
        df = spark.createDataFrame(
            [("m", wkt_3857, "EPSG:3857")], "name string, geometry string, crs string"
        )
        got = align_regions_to_crs(df, "EPSG:32610").collect()[0]
        assert got["crs"] == "EPSG:32610"
        ring = W.parse_wkt(got["geometry"])[0][0]
        # corner-for-corner match with the direct 3857→32610 transform
        # (ring order is preserved; note a min/max comparison would be
        # wrong — UTM grid convergence rotates the square ~0.5° here)
        rx = np.asarray([mx[0], mx[1], mx[1], mx[0], mx[0]])
        ry = np.asarray([my[0], my[0], my[1], my[1], my[0]])
        ex, ey = C.transform_xy(rx, ry, "EPSG:3857", "EPSG:32610")
        assert np.allclose(ring[:, 0], ex, atol=0.01)
        assert np.allclose(ring[:, 1], ey, atol=0.01)


class TestDatums:
    """Helmert/TOWGS84 datum shifts (round 4): OSGB36 + British
    National Grid, ED50/UTM, ETRS89 — the EPSG-published grid-free
    transforms pyproj falls back to without distortion grids."""

    def test_bng_projection_known_value(self):
        # OS "A guide to coordinate systems in Great Britain" worked
        # example (Caister water tower), OSGB36 geographic → BNG:
        # 52°39'27.2531"N 1°43'4.5177"E → E 651409.903, N 313177.270.
        # Projection-only (both sides OSGB36 datum) — validates the
        # parameterized TM on Airy 1830 with lat0/fn.
        lat = np.asarray([52 + 39 / 60 + 27.2531 / 3600])
        lon = np.asarray([1 + 43 / 60 + 4.5177 / 3600])
        e, n = C.transform_xy(lon, lat, "EPSG:4277", "EPSG:27700")
        assert e[0] == pytest.approx(651409.903, abs=0.02)
        assert n[0] == pytest.approx(313177.270, abs=0.02)
        # and back
        lon2, lat2 = C.transform_xy(e, n, "EPSG:27700", "EPSG:4277")
        # ~2 mm Snyder-series truncation at 3.7 deg from lon0
        assert lon2[0] == pytest.approx(lon[0], abs=1e-7)
        assert lat2[0] == pytest.approx(lat[0], abs=1e-7)

    def test_bng_wgs84_roundtrip_and_shift_magnitude(self):
        # London-ish BNG points → WGS84 and back: the Helmert inverse
        # is the exact matrix inverse, so the roundtrip is lossless
        # (only Bowring + series noise remains)
        e = np.linspace(300000.0, 600000.0, 7)
        n = np.linspace(100000.0, 400000.0, 7)
        lon, lat = C.transform_xy(e, n, "EPSG:27700", "EPSG:4326")
        assert np.all((-7.5 < lon) & (lon < 2.5))
        assert np.all((50.5 < lat) & (lat < 54.0))
        e2, n2 = C.transform_xy(lon, lat, "EPSG:4326", "EPSG:27700")
        assert np.allclose(e, e2, atol=1e-4)
        assert np.allclose(n, n2, atol=1e-4)
        # the datum shift itself is ~100 m over Britain: compare
        # against projecting WITHOUT the shift (OSGB36 geographic
        # treated as if WGS84)
        lon_raw, lat_raw = C.tm_inverse(e, n, **C._BNG)
        dx = (lon - lon_raw) * 111320.0 * np.cos(np.deg2rad(lat))
        dy = (lat - lat_raw) * 110574.0
        dist = np.hypot(dx, dy)
        assert np.all((60.0 < dist) & (dist < 180.0))

    def test_ed50_utm_roundtrip_and_shift_magnitude(self):
        # ED50/UTM 31N (central Europe) ↔ WGS84/UTM 31N: the mean
        # European 3-param shift is ~180 m in ECEF
        e = np.linspace(400000.0, 700000.0, 7)
        n = np.linspace(5_200_000.0, 5_800_000.0, 7)
        ew, nw = C.transform_xy(e, n, "EPSG:23031", "EPSG:32631")
        dist = np.hypot(ew - e, nw - n)
        assert np.all((80.0 < dist) & (dist < 250.0))
        e2, n2 = C.transform_xy(ew, nw, "EPSG:32631", "EPSG:23031")
        assert np.allclose(e, e2, atol=1e-4)
        assert np.allclose(n, n2, atol=1e-4)

    def test_etrs89_utm_equals_wgs84_utm(self):
        # ETRS89 ≡ WGS84 at Helmert accuracy; 25832 ↔ 32632 must be
        # a near-identity (only GRS80-vs-WGS84 flattening, sub-mm)
        e = np.asarray([500000.0, 600000.0])
        n = np.asarray([5_500_000.0, 5_700_000.0])
        e2, n2 = C.transform_xy(e, n, "EPSG:25832", "EPSG:32632")
        assert np.allclose(e, e2, atol=1e-3)
        assert np.allclose(n, n2, atol=1e-3)

    def test_bng_to_webmercator_composes(self):
        # full composition: BNG → (Airy TM⁻¹) → OSGB36 → Helmert →
        # WGS84 → spherical Mercator; Trafalgar-Square-ish BNG
        x, y = C.transform_xy(np.asarray([530030.0]), np.asarray([180380.0]),
                              "EPSG:27700", "EPSG:3857")
        lon, lat = C.webmercator_to_geographic(x, y)
        assert lon[0] == pytest.approx(-0.128, abs=0.02)
        assert lat[0] == pytest.approx(51.508, abs=0.02)

    def test_same_datum_projection_skips_helmert(self):
        # 4277 → 27700 must not apply any datum shift: projecting the
        # OS worked example via transform_xy equals calling the TM
        # kernel directly
        lat = np.asarray([52.5])
        lon = np.asarray([1.0])
        e1, n1 = C.transform_xy(lon, lat, "EPSG:4277", "EPSG:27700")
        e2, n2 = C.tm_forward(lon, lat, **C._BNG)
        assert e1[0] == e2[0] and n1[0] == n2[0]
