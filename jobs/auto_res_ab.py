"""A/B the grid resolution: candidate fan-out vs build-side cover.

VERDICT r3 #4 'done' evidence: for DEFAULT_RES, auto_res, and two
bracketing resolutions, measure on the driver testdata
(a) build-side exploded cover cells (region replication),
(b) probe-side exploded cover cells (tile replication),
(c) RAW cell-equi-join pairs — the rows Spark materializes before the
    JVM bbox prefilter; this is the res-sensitive join cost, and
(d) final candidates after bbox refine + reference-point dedup —
    res-INVARIANT by construction (printed once as the sanity check
    that res tunes cost, never results).

Too-coarse cells inflate (c) (many geometries share a cell); too-fine
cells inflate (a)+(b) (each bbox covers many cells). auto_res picks
cell ≈ 2× the median geometry extent — the knee where all stay O(1)
per geometry — from the data instead of the DEFAULT_RES constant.

Usage: python jobs/auto_res_ab.py [sf_dir]
Prints one JSON line per resolution; results recorded in NOTES.md.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import georip_spark  # noqa: E402
import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from georip_spark import functions as GF  # noqa: E402
from georip_spark.operators.joins import (  # noqa: E402
    DEFAULT_RES,
    auto_res,
    prepare_regions,
    spatial_join_tiles_regions,
)
from georip_spark.operators.tiling import tile_grid  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = georip_spark.get_spark("auto-res-ab")
    spark.sparkContext.setLogLevel("ERROR")

    rasters = E._rasters_from_part(spark, sf_dir)
    regions = E._regions_from_part(spark, sf_dir)
    tiles = tile_grid(rasters)
    tiles = tiles.select("*", *GF.parse_doc_id(F.col("doc_id")))

    from georip_spark.geo import cells

    resolved = auto_res(prepare_regions(regions))
    for res in sorted({DEFAULT_RES, resolved, resolved - 3, resolved + 3}):
        prepared = prepare_regions(regions, res=res)
        cover_cells = prepared.select(
            F.sum(F.size("cover")).alias("n")
        ).collect()[0]["n"]
        probe = tiles.withColumn(
            "cell",
            F.explode(cells.cover_bbox_expr(
                F.col("minx"), F.col("miny"), F.col("maxx"), F.col("maxy"), res
            )),
        ).select("region", "start_year", "end_year", "cell")
        build = prepared.select(
            "region", "start_year", "end_year", F.explode("cover").alias("cell")
        )
        raw_pairs = probe.join(
            F.broadcast(build), ["region", "start_year", "end_year", "cell"]
        ).count()
        cand = spatial_join_tiles_regions(
            tiles, prepared, res=res, how="inner",
            clip=False, refine=False, broadcast_regions=True,
        )
        n_cand = cand.count()
        print(json.dumps({
            "res": res,
            "is_auto": res == resolved,
            "is_default": res == DEFAULT_RES,
            "build_cover_cells": int(cover_cells),
            "probe_cover_cells": int(probe.count()),
            "raw_cell_pairs": int(raw_pairs),
            "final_candidates_res_invariant": int(n_cand),
        }))


if __name__ == "__main__":
    main()
