"""Scalar column functions: doc-id naming law, label-line formatting.

All pure Catalyst expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- doc_id
# The reference names rasters
#   {region}[_Expanded_]{start}to{end}_NDVI_Difference.tif
# (construct: georip/geoprocessing/utils.py:63-93 — a region ending in
# a digit gains "_", a region ending in "E" becomes "{region[:-1]}_Expanded_").
# The parser (georip/geoprocessing/utils.py:96-119) splits on "_" and
# accepts "to"- or "-"-separated years. NOTE a reference quirk: its
# parser tests `"extended" in parts[1].lower()` while its constructor
# writes "Expanded", so the reference would crash parsing its own
# Expanded names; we accept both spellings (robust superset).


def build_doc_id(region: Column, start_year: Column, end_year: Column) -> Column:
    """Construct the doc_id (raster stem) from (region, start, end)."""
    last = F.substring(region, -1, 1)
    prefix = (
        F.when(last.rlike("[0-9]"), F.concat(region, F.lit("_")))
        .when(last == "E", F.concat(F.expr("substring(region, 1, length(region)-1)"), F.lit("_Expanded_")))
        .otherwise(F.concat(region, F.lit("_")))
    )
    return F.concat(
        prefix, start_year.cast("string"), F.lit("to"), end_year.cast("string"),
        F.lit("_NDVI_Difference"),
    )


def parse_doc_id(doc_id: Column) -> list[Column]:
    """doc_id → (region, start_year, end_year) columns.

    Mirrors parse_region_and_years_from_path
    (georip/geoprocessing/utils.py:96-119): split on "_", part 0 is the
    region, part 1 the years — unless part 1 is the Expanded/Extended
    marker, in which case the region regains its trailing "E" and the
    years come from part 2. Years split on "to" or "-".
    """
    parts = F.split(doc_id, "_")
    expanded = F.lower(parts[1]).rlike("^(expanded|extended)$")
    region = F.when(expanded, F.concat(parts[0], F.lit("E"))).otherwise(parts[0])
    years_raw = F.when(expanded, parts[2]).otherwise(parts[1])
    years = F.split(years_raw, "to|-")
    # try_cast: ANSI mode would throw on malformed doc_ids; the
    # reference's year validation coerces + drops (P6)
    return [
        region.alias("region"),
        years[0].try_cast("int").alias("start_year"),
        years[1].try_cast("int").alias("end_year"),
    ]


def tile_media_ref(doc_id: Column, row: Column, col: Column) -> Column:
    """Tile id `{stem}_tile_{row}_{col}` with row/col = PIXEL offsets
    (georip/raster/tools.py:274)."""
    return F.concat(
        doc_id, F.lit("_tile_"), row.cast("string"), F.lit("_"), col.cast("string")
    )


def fmt6(c: Column) -> Column:
    """Format a double rounded to 6 decimals the way Python's str()
    prints it (no trailing zeros) — the reference writes labels via
    str(round(x, 6)) (georip/geometry/__init__.py:140-144,
    georip/modeling/yolo/__init__.py:576). `0.25` → "0.25", `0.0` → "0.0".
    """
    r = F.round(c, 6)
    s = F.format_number(r, 6)  # e.g. 0.250000 (no grouping under 1000)
    s = F.regexp_replace(s, ",", "")
    s = F.regexp_replace(s, "0+$", "")
    s = F.regexp_replace(s, "\\.$", ".0")
    return s
