"""End-to-end timing of q11's knn_join at sf0.1 (round-5 VERDICT #2).

Measured history on this VM (warm, local[32]):
  round-4 structure (per-pass anti-join count actions, (2r+1)²-rule
  tail): e2e 3.5-4.2s; a forced 6.3M-pair tail measured 7-8.4s, a
  ~750k-pair tail ~1.3s — the quadratic-in-SF term the pair-cap rule
  now bounds.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

import georip_spark  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import __spark_entry__ as em

    spark = georip_spark.get_spark("knn-profile")
    spark.sparkContext.setLogLevel("ERROR")

    left = em._points_from_events(spark, SF).filter(F.col("event_id") % 5 == 0)
    right = em._supplier_points(spark, SF)
    print("left", left.count(), "right", right.count(), flush=True)

    # warm the plan shapes
    em.q11_knn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite").save()

    for i in range(5):
        t0 = time.time()
        em.q11_knn(spark, SF).write.format("noop").mode("overwrite").save()
        print(f"e2e q11 run{i}: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
