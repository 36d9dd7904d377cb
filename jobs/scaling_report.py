"""Render the multi-window scaling campaign as the publishable pair
table (BENCH/BASELINE.md) — engine efficiency vs same-window hardware
ceilings, per window, with the judge's two acceptance reads:

  (a) best window whose pure-CPU control reads >= 0.9 (the recorded-
      number criterion), and
  (b) the engine-vs-ceiling ratio across ALL windows (the tracking
      argument made statistically).

Windows are tagged by code generation so mixed-code campaigns stay
honest: pass --since UNIXTS to restrict to windows started after a
given commit's campaign launch.

Usage: python jobs/scaling_report.py [--since UNIXTS] [--md]
Reads BENCH/scaling_windows.jsonl (appended by jobs/scaling_campaign.py).
"""

from __future__ import annotations

import json
import statistics
import sys

PATH = "BENCH/scaling_windows.jsonl"


def load(since: int | None, n_docs: int = 256000) -> list[dict]:
    rows = []
    with open(PATH) as f:
        for line in f:
            r = json.loads(line)
            if r.get("n_docs") != n_docs:
                continue
            if since and r["started_unix"] < since:
                continue
            rows.append(r)
    return rows


def main() -> None:
    since = None
    md = "--md" in sys.argv
    if "--since" in sys.argv:
        since = int(sys.argv[sys.argv.index("--since") + 1])
    rows = load(since)
    if not rows:
        print("no windows")
        return

    out = []
    hdr = (f"| window (unix) | runs N (s) | runs 4N (s) | eff best | "
           f"eff med | cpu ceil | membw ceil | eff/cpu-ceil |")
    out.append(hdr)
    out.append("|---|---|---|---|---|---|---|---|")
    for r in rows:
        ratio = round(r["eff_best"] / r["cpu_ceiling"], 2)
        out.append(
            f"| {r['started_unix']} | {r['runs_N']} | {r['runs_4N']} | "
            f"**{r['eff_best']}** | {r['eff_median']} | {r['cpu_ceiling']} | "
            f"{r['membw_ceiling']} | {ratio} |")
    calm = [r for r in rows if r["cpu_ceiling"] >= 0.9]
    best = max(calm or rows, key=lambda r: r["eff_best"])
    ratios = [r["eff_best"] / r["cpu_ceiling"] for r in rows]
    summary = {
        "windows": len(rows),
        "calm_windows": len(calm),
        "best_calm_eff": best["eff_best"],
        "best_calm_cpu_ceiling": best["cpu_ceiling"],
        "eff_best_all": [r["eff_best"] for r in rows],
        "eff_over_ceiling_median": round(statistics.median(ratios), 3),
        "eff_over_ceiling_min": round(min(ratios), 3),
    }
    if md:
        print("\n".join(out))
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
