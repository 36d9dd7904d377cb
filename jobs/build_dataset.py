"""spark-submit entry point: build the chip/label dataset end-to-end.

Cluster usage (north_rule packaging):

    cd /root/repo && zip -r /tmp/georip_spark.zip georip_spark
    spark-submit --py-files /tmp/georip_spark.zip \
        jobs/build_dataset.py --n-docs 100000 --out /data/out \
        [--resume-dir /data/stages] [--salt 8]

Local smoke: python jobs/build_dataset.py --n-docs 50 --out /tmp/out
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=1000)
    ap.add_argument("--polys-per-doc", type=int, default=3)
    ap.add_argument("--out", required=True)
    ap.add_argument("--resume-dir", default=None,
                    help="stage-checkpoint dir; reruns resume from completed buckets")
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--salt", type=int, default=None,
                    help="explicit salt factor for hot cells")
    ap.add_argument("--master", default=None)
    args = ap.parse_args()

    import georip_spark
    from georip_spark import synth
    from georip_spark.pipeline import build_dataset

    spark = georip_spark.get_spark("build-dataset", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    rasters = synth.synth_rasters(spark, args.n_docs)
    regions = synth.synth_regions(spark, rasters, args.polys_per_doc)

    if args.resume_dir:
        from georip_spark.lineage import StageStore, run_pipeline_with_lineage

        store = StageStore(args.resume_dir)
        docs = run_pipeline_with_lineage(
            spark, rasters, regions, store, n_buckets=args.n_buckets
        )
        docs.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"stages": [store.metrics("tiles"), store.metrics("docs_out")]}))
    else:
        out = build_dataset(rasters, regions, salt=args.salt)
        out["docs_out"].write.mode("overwrite").parquet(args.out)

    written = spark.read.parquet(args.out)
    stats = written.selectExpr("count(*) AS docs", "sum(size(spans)) AS spans").first()
    print(json.dumps({"docs": stats["docs"], "spans": int(stats["spans"])}))


if __name__ == "__main__":
    main()
