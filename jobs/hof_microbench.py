"""2→8-core scaling microbench for the hot-stage clip formulations.

The 256k campaign tops out near eff 0.65 while the same-window
hardware controls read ≥0.84 (cpu/membw/randacc) — so ~20-35% is
structural. The per-stage profile pins it on the main fact stage
(cpu/run 0.96, aggregate CPU time grows ~1.5× at 8 threads): the
interpreted higher-order-function clip allocates boxed
doubles/structs per vertex per pass, and allocation bandwidth is a
shared resource that stops scaling before the cores do.

This microbench isolates that term: the SAME pair-shaped input
(shells + tile bbox), one variant per formulation, each run at
local[2] and local[8] in fresh JVMs, interleaved. Variants:

  gen        current jvm_clip.clip_normalize_coords (struct points)
  trivhof    trivial interpreted HOF over the same arrays (isolates
             "interpreted HOF tax" from the S-H algorithm)
  codegen    equivalent-flops pure scalar column math (whole-stage
             codegen baseline — the ceiling for any JVM expression)
  kernel     the Arrow/pandas clip kernel (the Python lane)

plus JVM flag variants of `gen` (bigger heap, ParallelGC) to separate
allocation-rate limits from GC-policy limits.

Usage: python jobs/hof_microbench.py [n_rows] [variants_csv]

RESULT (n=1.5M, 2026-08-17, recorded in NOTES.md): the hypothesis is
REFUTED — `gen` (full interpreted S-H HOF) scales at 0.919, i.e. the
HOF clip itself tracks the cores when it dominates per-row cost.
`gensc`/`trivhof`/`codegen` read 0.67/0.38/0.34 only because their
total runtimes (1.4–5 s) sit on the fixed per-job floor (~1–3 s of
scheduling + 64-file scan setup), not because light JVM work
anti-scales. `kernel` (Arrow lane) reads a meaningless 1.29: python
workers scale with task-thread count but run on the VM's spare
physical cores in this local-mode proxy. Absolute: JVM clip 3.5×
faster than the kernel at 8 cores (6.2 s vs 21.6 s). The 256k
campaign's missing ~25-35% must live in the shuffle/assemble stages,
not the clip — see the 256k per-stage profile in NOTES.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

PREP = r"""
import sys
sys.path.insert(0, ".")
import georip_spark
from pyspark.sql import functions as F
n = int(sys.argv[1]); out = sys.argv[2]
spark = georip_spark.get_spark("hofmb-prep", master="local[8]")
spark.sparkContext.setLogLevel("ERROR")
# pair-shaped rows: one triangle shell per row placed around a
# 640x640 tile at UTM-ish magnitudes; ~half straddle the tile edge
# (full S-H), ~quarter inside (shortcut), ~quarter miss
df = spark.range(n).select(
    F.col("id"),
    (F.lit(500000.0) + (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1000)))
     .cast("double")).alias("minx"),
    (F.lit(4000000.0) + (F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)))
     .cast("double")).alias("miny"),
)
df = df.select(
    "id", "minx", "miny",
    (F.col("minx") + 640.0).alias("maxx"),
    (F.col("miny") + 640.0).alias("maxy"),
)
u = lambda t: (F.pmod(F.xxhash64("id", F.lit(t)), F.lit(10**6)) / 1e6)
x0 = F.col("minx") - 320.0 + u(3) * 1280.0
y0 = F.col("miny") - 320.0 + u(4) * 1280.0
w = u(5) * 300.0 + 20.0
h = u(6) * 300.0 + 20.0
shell = F.array(x0, y0, x0 + w, y0, x0, y0 + h)  # CCW triangle, unclosed
df = df.select(
    "id", "minx", "miny", "maxx", "maxy",
    F.array(shell).alias("shells"),
    x0.alias("g_minx"), y0.alias("g_miny"),
    (x0 + w).alias("g_maxx"), (y0 + h).alias("g_maxy"),
    F.format_string(
        "POLYGON ((%.6f %.6f, %.6f %.6f, %.6f %.6f, %.6f %.6f))",
        x0, y0, x0 + w, y0, x0, y0 + h, x0, y0).alias("geometry"),
)
df.repartition(64).write.mode("overwrite").parquet(out)
print("PREPOK", spark.read.parquet(out).count())
"""

WORKER = r"""
import json, sys, time
sys.path.insert(0, ".")
import georip_spark
from pyspark.sql import functions as F

cores = int(sys.argv[1]); inp = sys.argv[2]; variant = sys.argv[3]
heap = sys.argv[4] if len(sys.argv) > 4 else "16g"
gc = sys.argv[5] if len(sys.argv) > 5 else "default"
jvm_opts = ""
conf = {"spark.sql.shuffle.partitions": str(4 * cores),
        "spark.driver.memory": heap}
for tok in gc.split("+"):
    if tok == "parallel":
        jvm_opts += " -XX:+UseParallelGC"
    elif tok == "bigyoung":
        jvm_opts += (" -XX:+UnlockExperimentalVMOptions"
                     " -XX:G1NewSizePercent=40 -XX:G1MaxNewSizePercent=70")
    elif tok == "shm":
        import os as _os
        _os.makedirs("/dev/shm/spark-local", exist_ok=True)
        conf["spark.local.dir"] = "/dev/shm/spark-local"
    elif tok == "zstd":
        conf["spark.io.compression.codec"] = "zstd"
    elif tok == "nocomp":
        conf["spark.shuffle.compress"] = "false"
    elif tok == "bigbuf":
        conf["spark.shuffle.file.buffer"] = "1m"
        conf["spark.shuffle.unsafe.file.output.buffer"] = "1m"
    elif tok != "default":
        raise SystemExit(f"unknown conf token {tok}")
if jvm_opts:
    conf["spark.driver.extraJavaOptions"] = jvm_opts.strip()
spark = georip_spark.get_spark(
    f"hofmb-{variant}-{cores}", master=f"local[{cores}]", extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

from georip_spark.operators import jvm_clip, geom_udfs

def expr(df):
    if variant == "gen":
        c = jvm_clip.clip_normalize_coords(
            F.col("shells"), F.col("minx"), F.col("miny"),
            F.col("maxx"), F.col("maxy"))
        return df.select(c.alias("coords")).selectExpr(
            "sum(size(coords)) s", "count(coords) c")
    if variant == "gensc":  # with the bbox shortcut, as the pipeline runs it
        c = jvm_clip.clip_normalize_coords(
            F.col("shells"), F.col("minx"), F.col("miny"),
            F.col("maxx"), F.col("maxy"),
            g_bbox=(F.col("g_minx"), F.col("g_miny"),
                    F.col("g_maxx"), F.col("g_maxy")))
        return df.select(c.alias("coords")).selectExpr(
            "sum(size(coords)) s", "count(coords) c")
    if variant == "genshuf":
        # the real hot-stage shape: clip + label-format + a FAT
        # collect_list shuffle (no map-side reduction, like assemble's
        # groupBy(doc_id)) — isolates whether shuffle-heavy JVM work
        # under-scales by GC policy (G1 write barriers / concurrent
        # refinement vs ParallelGC's plain card table)
        c = jvm_clip.clip_normalize_coords(
            F.col("shells"), F.col("minx"), F.col("miny"),
            F.col("maxx"), F.col("maxy"))
        d = df.select(F.pmod(F.col("id"), F.lit(50000)).alias("g"),
                      c.alias("coords"))
        d = d.filter(F.col("coords").isNotNull())
        d = d.select(
            "g",
            F.concat_ws(
                " ", F.transform("coords", lambda x: F.round(x, 6)
                                 .cast("string"))).alias("label"),
            "coords")
        agg = d.groupBy("g").agg(
            F.array_sort(F.collect_list(F.struct("label", "coords")))
            .alias("rows"))
        return agg.selectExpr(
            "sum(aggregate(rows, 0L, (a, r) -> a + size(r.coords))) s",
            "sum(size(rows)) c")
    if variant == "trivhof":
        # same arrays, trivial interpreted HOF work per element
        s = F.aggregate(F.col("shells")[0], F.lit(0.0),
                        lambda a, x: a + x * 0.5)
        return df.select(s.alias("v")).selectExpr("sum(v) s", "count(v) c")
    if variant == "codegen":
        # equivalent-magnitude scalar flops, fully codegen
        acc = F.lit(0.0)
        for i in range(40):
            acc = acc + F.pow(F.col("g_minx") * 1e-6 + i * 0.1, 1.0001)
        return df.select(acc.alias("v")).selectExpr("sum(v) s", "count(v) c")
    if variant == "kernel":
        c = geom_udfs.clip_and_normalize(
            F.col("geometry"), F.col("minx"), F.col("miny"),
            F.col("maxx"), F.col("maxy"))
        return df.select(c.alias("coords")).selectExpr(
            "sum(size(coords)) s", "count(coords) c")
    raise SystemExit(f"unknown variant {variant}")

df = spark.read.parquet(inp)
expr(df.limit(50000)).collect()          # warm: JIT, python fork
times = []
for _ in range(2):
    t0 = time.time()
    r = expr(df).collect()[0]
    times.append(round(time.time() - t0, 2))
print("RES " + json.dumps({"variant": variant, "cores": cores,
                           "heap": heap, "gc": gc, "times": times,
                           "check": str(r["s"])[:14]}))
"""


def run(cores, inp, variant, heap="16g", gc="default"):
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cores), inp, variant, heap, gc],
        capture_output=True, text=True, cwd=".", timeout=1800,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("RES ")]
    if not line:
        print(out.stderr[-2000:])
        raise SystemExit(1)
    return json.loads(line[0][4:])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_500_000
    variants = (sys.argv[2].split(",") if len(sys.argv) > 2
                else ["gen", "gensc", "trivhof", "codegen", "kernel"])
    inp = os.environ.get("HOFMB_INP", "")
    if not (inp and os.path.exists(inp + "/_SUCCESS")):
        inp = tempfile.mkdtemp(prefix=f"hofmb_{n}_")
        out = subprocess.run([sys.executable, "-c", PREP, str(n), inp],
                             capture_output=True, text=True, cwd=".",
                             timeout=600)
        if "PREPOK" not in out.stdout:
            print(out.stderr[-2000:])
            raise SystemExit(1)
    print(json.dumps({"input": inp, "n": n}), flush=True)

    rows = []
    for spec in variants:
        parts = spec.split(":")  # variant[:heap[:gc]]
        v = parts[0]
        heap = parts[1] if len(parts) > 1 else "16g"
        gc = parts[2] if len(parts) > 2 else "default"
        lo = run(2, inp, v, heap, gc)
        hi = run(8, inp, v, heap, gc)
        t2, t8 = min(lo["times"]), min(hi["times"])
        eff = round((t2 / t8) / 4.0, 3)
        rows.append({"variant": spec, "t2": t2, "t8": t8, "eff": eff,
                     "check2": lo["check"], "check8": hi["check"]})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
