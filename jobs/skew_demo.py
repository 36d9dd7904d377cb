"""Skew demonstration: explicit salting on a pathological hot cell.

north_rule: "partitioning / shuffle / skew handled explicitly".
This job builds a worst-case workload — every probe point and every
build geometry lands in ONE grid cell, so the cell-indexed equi-join
degenerates to a single join key — including the per-candidate
Python clip that makes the hot partition expensive — and measures the same join
unsalted vs salted (salt replicates the build side into k sub-keys
and splits the probe by hash, turning one monster task into k even
ones).

Usage: python jobs/skew_demo.py [n_probe] [n_build] [salt]
Prints one JSON line with both timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_probe = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    n_build = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    salt = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    import georip_spark
    from pyspark.sql import functions as F
    from georip_spark.operators.joins import prepare_regions, spatial_join_tiles_regions

    spark = georip_spark.get_spark("skew-demo")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism

    # everything inside cell [0, 1024)² at res 10 → ONE join key
    probe = spark.range(n_probe).repartition(par).select(
        F.col("id").cast("string").alias("media_ref"),
        (F.pmod(F.col("id") * 7919, 1000) + 10.0).alias("minx"),
        (F.pmod(F.col("id") * 104729, 1000) + 10.0).alias("miny"),
    ).withColumn("maxx", F.col("minx") + 2.0).withColumn("maxy", F.col("miny") + 2.0)

    build = spark.range(n_build).select(
        F.col("id").alias("poly_id"),
        (F.pmod(F.col("id") * 613, 980) + 5.0).alias("gx"),
        (F.pmod(F.col("id") * 389, 980) + 5.0).alias("gy"),
    ).select(
        "poly_id",
        F.format_string(
            "POLYGON ((%.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f, %.1f %.1f))",
            F.col("gx"), F.col("gy"), F.col("gx") + 40.0, F.col("gy"),
            F.col("gx") + 40.0, F.col("gy") + 40.0, F.col("gx"), F.col("gy") + 40.0,
            F.col("gx"), F.col("gy"),
        ).alias("geometry"),
    )
    prepared = prepare_regions(build, res=10).cache()
    prepared.count()
    probe = probe.cache()
    probe.count()

    def run(salt_k, aqe_skew):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe_skew).lower())
        j = spatial_join_tiles_regions(
            probe, prepared, res=10, how="inner", on_years=False,
            clip=True, refine=False, salt=salt_k,
        )
        t0 = time.time()
        n = j.count()
        return n, time.time() - t0

    run(None, True)  # warm
    n0, t_worst = run(None, False)    # no AQE skew handling, no salt
    n1, t_salted = run(salt, False)   # engine's explicit salting
    n2, t_aqe = run(None, True)       # Spark AQE skew-join
    n3, t_auto = run("auto", False)   # histogram-driven auto salting
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    assert n0 == n1 == n2 == n3, (n0, n1, n2, n3)
    print(json.dumps({
        "n_probe": n_probe, "n_build": n_build, "matches": n0,
        "unsalted_no_aqe_sec": round(t_worst, 2),
        f"salted_{salt}_no_aqe_sec": round(t_salted, 2),
        "unsalted_aqe_skewjoin_sec": round(t_aqe, 2),
        "auto_salt_no_aqe_sec": round(t_auto, 2),
        "salting_speedup": round(t_worst / t_salted, 2),
        "aqe_speedup": round(t_worst / t_aqe, 2),
        "auto_salt_speedup": round(t_worst / t_auto, 2),
    }))


if __name__ == "__main__":
    main()
