"""JVM WKT stats (operators/jvm_wkt.py) vs the pandas-UDF kernel path:
field-for-field parity on the synth corpus plus an adversarial WKT
sweep (whitespace variants, Z coords, EMPTY forms, POINT, holes,
multipolygons, scientific/negative numbers, malformed fragments)."""

import math

import pytest
from pyspark.sql import functions as F

from georip_spark.operators import geom_udfs

FIELDS = [
    "minx", "miny", "maxx", "maxy", "is_empty", "is_valid", "area",
    "is_rect_blccw", "shells", "has_holes",
]

ADVERSARIAL = [
    None,
    "",
    "   ",
    "POLYGON EMPTY",
    "polygon empty",
    "MULTIPOLYGON EMPTY",
    "POINT EMPTY",
    "POINT (1.5 2.5)",
    "POINT Z (1 2 3)",
    "point(-3.25 +4)",
    "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0))",
    "POLYGON((0 0,4 0,4 3,0 3,0 0))",
    "  POLYGON  (  ( 0 0 , 4 0 , 4 3 , 0 3 , 0 0 )  )  ",
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
    "POLYGON Z ((0 0 1, 4 0 2, 4 3 3, 0 3 4, 0 0 1))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))",
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0), (0.5 0.5, 1 0.5, 1 1, 0.5 1, 0.5 0.5)), ((5 5, 7 5, 6 7, 5 5)))",
    "POLYGON ((1e3 -2E-2, 1.5e3 -2e-2, 1.5e3 2e2, 1e3 2e2, 1e3 -2E-2))",
    "POLYGON ((-0.0 0.0, 4 0, 4 3, -0.0 3, -0.0 0.0))",
    # unclosed ring (still parses; is_valid must be False both sides)
    "POLYGON ((0 0, 4 0, 4 3, 0 3))",
    # degenerate: 3-point closed ring (area 0 -> invalid)
    "POLYGON ((0 0, 4 0, 0 0))",
    # CW rectangle (valid but not the BL-CCW canonical rect)
    "POLYGON ((0 0, 0 3, 4 3, 4 0, 0 0))",
    # BL-CCW canonical rect (is_rect_blccw must be True both sides)
    "POLYGON ((1 1, 5 1, 5 4, 1 4, 1 1))",
    # malformed fragments -> EMPTY row on both paths
    "LINESTRING (0 0, 1 1)",
    "POLYGON",
    "POLYGON (",
    "POLYGON ((1 2, 3 4",
    "POLYGON ((x y, 1 2, 3 4, x y))",
    "POLYGON ((1, 2 3, 4 5, 1))",
    "garbage",
    "POLYGON ((1 2, 3 4, 5 6, 1 2)) trailing",
]


def _collect(spark, wkts, engine):
    df = spark.createDataFrame([(i, w) for i, w in enumerate(wkts)],
                               "id long, geometry string")
    out = geom_udfs.geometry_stats(df, "geometry", engine=engine)
    return {r["id"]: r.asDict() for r in out.collect()}


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


def assert_parity(spark, wkts):
    jvm = _collect(spark, wkts, "jvm")
    arrow = _collect(spark, wkts, "arrow")
    for i, w in enumerate(wkts):
        for f in FIELDS:
            a, b = jvm[i][f], arrow[i][f]
            if f == "shells":
                assert a == b, f"shells mismatch on {w!r}: {a} vs {b}"
            elif f == "area":
                # strictly-sequential fold vs np.sum pairwise: last-ULP
                assert (a == b or abs(a - b) <= 1e-9 * max(1.0, abs(b))), \
                    f"area mismatch on {w!r}: {a} vs {b}"
            else:
                assert _eq(a, b), f"{f} mismatch on {w!r}: {a} vs {b}"


def test_adversarial_parity(spark):
    assert_parity(spark, ADVERSARIAL)


def test_synth_corpus_parity(spark):
    from georip_spark import synth

    rasters = synth.synth_rasters(spark, 300)
    regions = synth.synth_regions(spark, rasters, polys_per_doc=3)
    wkts = [r[0] for r in regions.select("geometry").collect()]
    assert len(wkts) >= 600
    assert_parity(spark, wkts[:600])


def test_prepare_regions_plan_has_no_python(spark):
    """The dim-prepare path must be whole-JVM: no ArrowEvalPython /
    BatchEvalPython node in prepare_regions' physical plan, and the
    parse must appear under a single Generate (inline) node so
    CollapseProject cannot duplicate it per projected field."""
    from georip_spark import synth
    from georip_spark.operators.joins import prepare_regions

    rasters = synth.synth_rasters(spark, 20)
    regions = synth.synth_regions(spark, rasters, polys_per_doc=3)
    plan = prepare_regions(regions)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Generate inline" in plan


@pytest.mark.parametrize("wkt_s,valid,rect,holes", [
    ("POLYGON ((1 1, 5 1, 5 4, 1 4, 1 1))", True, True, False),
    ("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 3 2, 3 3, 2 3, 2 2))",
     True, False, True),
    ("POINT (3 4)", False, False, False),
    ("POLYGON EMPTY", False, False, False),
])
def test_jvm_flags(spark, wkt_s, valid, rect, holes):
    df = spark.createDataFrame([(wkt_s,)], "geometry string")
    r = geom_udfs.geometry_stats(df, "geometry", engine="jvm").collect()[0]
    assert r["is_valid"] is valid
    assert r["is_rect_blccw"] is rect
    assert r["has_holes"] is holes
