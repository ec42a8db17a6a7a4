"""Scaling probe for the shared-artifact BUILD legs (VERDICT r11 #3).

bench.py made the nine artifact build costs visible at sf0.1
(``build_*_sec`` legs), but only at one scale — a build whose cost grows
super-linearly would still read as a constant. This probe reuses
scaling_probe's replica builder (same key-offset + token-tag rules) and
bench's evict-then-build pattern to time selected build legs at several
scales, appending a fitted exponent row to docs/SCALING.md.

Usage:
    python scripts/build_leg_probe.py [--legs semdedup_quantizer ...]
        [--scales 1 4 32] [--reps 2] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import importlib
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pubsub2bq_spark.session import get_spark  # noqa: E402
from pubsub2bq_spark.tables import drop_session_artifact  # noqa: E402


def main() -> int:
    from bench import ARTIFACT_BUILD_LEGS
    from scripts.scaling_probe import build_scaled

    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", nargs="+", default=["semdedup_quantizer"])
    ap.add_argument("--scales", nargs="+", type=int, default=[1, 4, 32])
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--workdir", default="/tmp/scale_probe")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "SCALING.md"))
    args = ap.parse_args()

    legs = {name: (mod, attr) for name, mod, attr in ARTIFACT_BUILD_LEGS}
    unknown = [leg for leg in args.legs if leg not in legs]
    if unknown:
        print(f"unknown build legs: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("build-leg-probe")
    results: dict[str, dict[int, float]] = {leg: {} for leg in args.legs}
    for scale in sorted(args.scales):
        sf_dir = build_scaled(spark, args.sf, scale, args.workdir)
        for leg in args.legs:
            mod, attr = legs[leg]
            fn = getattr(importlib.import_module(mod), attr)
            times = []
            for _ in range(args.reps):
                drop_session_artifact(spark, leg, sf_dir)
                t0 = time.perf_counter()
                fn(spark, sf_dir)
                times.append(time.perf_counter() - t0)
            results[leg][scale] = round(min(times), 3)
            print(f"x{scale:<3} build_{leg:<24} {results[leg][scale]}s",
                  flush=True)

    scales = sorted(args.scales)
    lines = [
        "",
        f"## Build-leg probe ({', '.join(f'{s}x' for s in scales)})",
        "",
        "| build leg | " + " | ".join(f"{s}x (s)" for s in scales)
        + " | exponent |",
        "|---|" + "---|" * (len(scales) + 1),
    ]
    for leg, by_scale in results.items():
        t1, tmax = by_scale[scales[0]], by_scale[scales[-1]]
        exp = (
            math.log2(tmax / t1) / math.log2(scales[-1] / scales[0])
            if t1 > 0 and scales[-1] > scales[0]
            else float("nan")
        )
        row = " | ".join(str(by_scale[s]) for s in scales)
        lines.append(f"| build_{leg} | {row} | {exp:.2f} |")
        print(f"BUILD {leg}: "
              + " ".join(f"x{s}={by_scale[s]}" for s in scales)
              + f" exponent={exp:.2f}")
    lines.append("")
    with open(args.out, "a") as f:
        f.write("\n".join(lines))
    print(f"appended build-leg section to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
