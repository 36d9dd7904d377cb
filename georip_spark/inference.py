"""Reverse (inference) pipeline (SURVEY.md §3.3 / M6).

The reference's predict path (georip/modeling/yolo/predict.py:170-333):
tile a raster → score tiles with a model → vectorize predicted masks
→ translate pixel→CRS (F11) → validity fix → dissolve (A7) →
re-attach attributes from the first intersecting truth row (J10).

Model scoring is out of scope (north_star: the engine stops at
chip/label emission), so scoring is a deterministic pseudo-scorer —
the point is that the same operator graph composes in reverse:
chips → masks → polygons → CRS → components → attributed regions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from georip_spark.geo import wkt as W
from georip_spark.operators.dissolve import (
    connected_components,
    overlap_pairs,
    union_members_clustered,
)
from georip_spark.operators.joins import prepare_regions
from georip_spark.operators.rastervec import vectorize_mask
from georip_spark.operators.tiling import tile_grid


_PRED_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("geometry", T.StringType()),  # CRS-space WKT
    ]
)


def pseudo_score_and_vectorize(tiles: DataFrame) -> DataFrame:
    """Deterministic stand-in for model inference: per tile, build a
    pseudo-probability mask from hash math, threshold it, vectorize
    (R2), and translate pixel coords → CRS via the tile's footprint
    (F11 — axis-aligned here, so a linear map of the ring coords).
    One mapInPandas pass; no model weights involved."""

    def run(batches):
        import hashlib

        for pdf in batches:
            rows = []
            # zip over ndarrays (not iterrows): vectorize is per-tile
            # work, but row access shouldn't pay pandas row-view cost
            for ref, minx, miny, maxx, maxy in zip(
                pdf["media_ref"].values, pdf["minx"].values, pdf["miny"].values,
                pdf["maxx"].values, pdf["maxy"].values,
            ):
                w = h = 16  # coarse mask per tile (model-output analog)
                # md5, not hash(): python hash() is salted per process
                seed = int.from_bytes(hashlib.md5(ref.encode()).digest()[:4], "big")
                rng = np.random.default_rng(seed)
                mask = (rng.random((h, w)) > 0.85).astype(np.uint8)
                mp = vectorize_mask(mask)
                if not mp:
                    continue
                # pixel → CRS: x = minx + px*(maxx-minx)/w ; y = maxy - py*(maxy-miny)/h
                sx = (maxx - minx) / w
                sy = (maxy - miny) / h
                crs_mp = [
                    [
                        np.column_stack(
                            [minx + ring[:, 0] * sx, maxy - ring[:, 1] * sy]
                        )
                        for ring in poly
                    ]
                    for poly in mp
                ]
                rows.append((ref, W.to_wkt(crs_mp)))
            yield pd.DataFrame(rows, columns=["media_ref", "geometry"])

    return tiles.select("media_ref", "minx", "miny", "maxx", "maxy").mapInPandas(
        run, _PRED_SCHEMA
    )


def compile_predictions(
    rasters: DataFrame,
    truth_regions: DataFrame,
    res: int = 10,
) -> DataFrame:
    """Full reverse pipeline: tile → pseudo-score+vectorize → dissolve
    into prediction components → re-attach class attributes from the
    first intersecting truth region (J10: first = min-ordered match).
    Returns (component, n_parts, geometry, class_name)."""
    tiles = tile_grid(rasters)
    preds = pseudo_score_and_vectorize(tiles)

    pred_prepared = prepare_regions(preds, res=res).filter(~F.col("is_empty"))
    pairs = overlap_pairs(pred_prepared, buffer=0.0, res=res)
    comps = connected_components(pairs, pred_prepared.select("geom_id"))
    member = pred_prepared.join(comps, "geom_id")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        # clustered union (dissolve.union_members_clustered): disjoint
        # mask polys pass through, bbox-overlapping clusters get the
        # TRUE boolean union (rectilinear → exact grid union), and the
        # per-row exact_boundary degradation flag is threaded to the
        # final output so degraded rows are filterable end-to-end.
        # Per-task work stays bounded — a prediction component can
        # span thousands of tiles, and a single monolithic union of
        # the whole component is the unbounded hot-task shape a
        # 100 TB job cannot afford.
        pdf = pdf.sort_values("geom_id").reset_index(drop=True)
        merged_mp, exact_boundary = union_members_clustered(pdf["geometry"])
        return pd.DataFrame(
            [
                {
                    "component": int(pdf["component"].iloc[0]),
                    "n_parts": len(pdf),
                    "geometry": W.to_wkt(merged_mp),
                    "exact_boundary": exact_boundary,
                    "minx": float(pdf["minx"].min()),
                    "miny": float(pdf["miny"].min()),
                    "maxx": float(pdf["maxx"].max()),
                    "maxy": float(pdf["maxy"].max()),
                }
            ]
        )

    merged = member.groupBy("component").applyInPandas(
        merge,
        "component long, n_parts long, geometry string, "
        "exact_boundary boolean, "
        "minx double, miny double, maxx double, maxy double",
    )

    # J10: inherit attributes from the first intersecting truth row —
    # bbox-candidate join + deterministic min-order pick
    truth = prepare_regions(truth_regions, res=res).filter(~F.col("is_empty")).select(
        F.col("geom_id").alias("truth_id"),
        F.col("class_name"),
        F.col("minx").alias("t_minx"), F.col("miny").alias("t_miny"),
        F.col("maxx").alias("t_maxx"), F.col("maxy").alias("t_maxy"),
    )
    cand = merged.join(
        F.broadcast(truth),
        (F.col("minx") <= F.col("t_maxx")) & (F.col("maxx") >= F.col("t_minx"))
        & (F.col("miny") <= F.col("t_maxy")) & (F.col("maxy") >= F.col("t_miny")),
        "left",
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("component").orderBy(F.col("truth_id").asc_nulls_last())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component", "n_parts", "geometry", "class_name",
            "exact_boundary",
        )
    )
