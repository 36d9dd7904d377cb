"""Characterize dissolve's pathological fallback rate (VERDICT r3 #3).

union_geometry (geo/boolean.py) self-checks its chained boundary
against the exact slab-decomposition union area and raises ValueError
on mismatch; dissolve then degrades that component to member-assembly
geometry, now flagged per row via `exact_boundary=False`. This sweep
measures how often that branch fires: 10^5 random components (the
same mixed triangle / axis-rect / rotated-rect generator as
tests/test_boolean.py::test_random_mixed_property, wider parameter
ranges), each unioned directly (no Spark — the fallback decision is
pure numpy, per component inside the grouped pandas UDF).

Prints ONE JSON line with the fallback count + rate; the result is
recorded in NOTES.md.

Usage: python jobs/fallback_sweep.py [n_components] [seed]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from georip_spark.geo import boolean, kernels  # noqa: E402


def rect(x0, y0, x1, y1):
    return [[np.array(
        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]], dtype=np.float64
    )]]


def tri(pts):
    a = np.asarray(list(pts) + [pts[0]], dtype=np.float64)
    if kernels.ring_area(a) < 0:
        a = a[::-1]
    return [[a]]


def random_component(rng: np.random.Generator) -> list:
    mps = []
    for _ in range(int(rng.integers(2, 9))):
        kind = int(rng.integers(3))
        cx, cy = rng.uniform(0, 30, 2)
        if kind == 0:
            a = np.column_stack(
                [cx + rng.uniform(-5, 5, 3), cy + rng.uniform(-5, 5, 3)]
            )
            r = np.vstack([a, a[:1]])
            if abs(kernels.ring_area(r)) < 0.25:
                continue
            mps.append(tri([tuple(p) for p in a]))
        elif kind == 1:
            w, h = rng.uniform(0.5, 8, 2)
            mps.append(rect(cx, cy, cx + w, cy + h))
        else:
            w, h = rng.uniform(0.5, 6, 2)
            th = rng.uniform(0, np.pi)
            c, s = np.cos(th), np.sin(th)
            base = np.array([[-w, -h], [w, -h], [w, h], [-w, h], [-w, -h]], float)
            mps.append([[np.column_stack([
                cx + base[:, 0] * c - base[:, 1] * s,
                cy + base[:, 0] * s + base[:, 1] * c,
            ])]])
    return mps


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    rng = np.random.default_rng(seed)
    fallbacks = 0
    area_mismatch = 0
    ran = 0
    t0 = time.time()
    while ran < n:
        mps = random_component(rng)
        if len(mps) < 2:
            continue
        ran += 1
        want = boolean.union_area(mps)
        try:
            g = boolean.union_geometry(mps)
        except ValueError:
            fallbacks += 1
            continue
        got = kernels.multipolygon_area(g)
        if not np.isclose(got, want, rtol=1e-6, atol=1e-9):
            area_mismatch += 1
        if ran % 10_000 == 0:
            print(json.dumps({"progress": ran, "fallbacks": fallbacks,
                              "sec": round(time.time() - t0, 1)}),
                  file=sys.stderr)
    print(json.dumps({
        "n_components": ran,
        "seed": seed,
        "fallbacks": fallbacks,
        "fallback_rate": fallbacks / ran,
        "silent_area_mismatch": area_mismatch,
        "sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
