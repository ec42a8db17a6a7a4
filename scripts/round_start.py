#!/usr/bin/env python
"""One-command round-start chore runner (judge r7 task #8).

Round 7 demonstrated the failure mode this script exists to prevent: the
evidence rotation in ``__spark_entry__`` is driven by IMPL_EVIDENCE.json,
and when that file is not refreshed after a driver round lands a new
CORRECTNESS_rN.json, the driver re-samples the identical 50 keys and the
round's entire correctness budget is wasted re-proving fresh-green rows.
Likewise the generated docs (docs/OPERATORS.md, SURVEY §2.13 count, README
key count) drift red the moment a key is added without regenerating them.

Run this once at the start of every round (after the driver's artifacts
from the previous round are present in the repo root):

    python scripts/round_start.py          # refresh evidence + docs, then verify
    python scripts/round_start.py --check  # verify only, fail if anything is stale

Steps:
  1. ``scripts/impl_evidence.py``      — fold the newest CORRECTNESS_rN.json
     rows into IMPL_EVIDENCE.json so fresh-green keys rotate to the back.
  2. ``scripts/gen_operator_docs.py``  — regenerate docs/OPERATORS.md.
  3. Doc-sync gate — run the tests that assert README / SURVEY §2.13 /
     docs/OPERATORS.md agree with the live registry, so any residual manual
     edit (e.g. the README key count) is caught here, not by the judge.

Exit status is non-zero if any step fails; the intent is that a round that
starts with this script cannot repeat round 7's stuck-rotation / red-CI
combination no matter how short the round is.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DOC_SYNC_TESTS = [
    "tests/test_units.py::test_survey_lists_every_key",
    "tests/test_docs.py::test_operators_md_current",
    "tests/test_docs.py::test_readme_key_count_matches_registry",
    # PLANS.md regeneration needs a Spark session (~minutes), so this
    # script verifies coverage instead of regenerating: a red here means
    # "run python scripts/gen_plan_docs.py", which the failure names.
    "tests/test_docs.py::test_plans_md_covers_plan_keys",
]


def run(cmd: list[str]) -> int:
    print(f"[round_start] $ {' '.join(cmd)}", flush=True)
    return subprocess.call(cmd, cwd=ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify-only: fail if evidence or docs are stale")
    args = ap.parse_args()

    py = sys.executable
    steps: list[list[str]] = []
    if args.check:
        steps.append([py, "scripts/impl_evidence.py", "--check"])
    else:
        steps.append([py, "scripts/impl_evidence.py"])
        steps.append([py, "scripts/gen_operator_docs.py"])
    steps.append([py, "-m", "pytest", "-q", *DOC_SYNC_TESTS])

    for cmd in steps:
        rc = run(cmd)
        if rc != 0:
            print(f"[round_start] FAILED (exit {rc}): {' '.join(cmd)}",
                  file=sys.stderr)
            return rc
    print("[round_start] all chores green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
