"""Attribute the FDR family's factor-50→factor-100 scaling slopes
(r12 verdict tasks #2 and #4).

The r12 factor-100 gate recorded two superlinear-looking alphas:

- **q45_combined_fdr α=1.43** — conflated with its first-touch per-corpus
  sets-fixture build (``STRESS_r12.json factor100_scaling_gate.alpha_note``).
  Task #2: re-measure with the fixture memoized on both ends and record the
  build-vs-query split and the WARM α.
- **q03_fdr_qvalue α=1.25** — unattributed.  Task #4: phase-instrument the
  two-pass global FDR (``pride_spark.operators.fdr.PHASE_LOG``) at both
  scales and attribute the superlinear remainder to a named phase
  (quantiles / bucket-stats collect / FDR-window minima collect /
  q-value checkpoint / repair+fingerprint tail).

Both queries are timed through the SAME distributed bit-exact fingerprint
the factor-100 gate uses (``f50_value_gate.spark_fingerprint`` in bits
mode), each scale run ``--runs`` times with the best (min) kept, so the
numbers are directly comparable to the gate rows they explain.

Usage:
    python tools/stress_scale.py --factor 50  --out /tmp/sf5  --queries ""
    python tools/stress_scale.py --factor 100 --out /tmp/sf10 --queries ""
    python tools/profile_fdr_slope.py [--runs 2] [--out /tmp/fdr_slope.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _drop_q45_fixture() -> None:
    """Remove any memoized q45 sets fixture so the next run is a cold build."""
    tmp = tempfile.gettempdir()
    for name in os.listdir(tmp):
        if name.startswith("pride_spark_q45sets_v1_"):
            shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf50-dir", default="/tmp/sf5")
    ap.add_argument("--sf100-dir", default="/tmp/sf10")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default="/tmp/fdr_slope.json")
    args = ap.parse_args()

    import f50_value_gate as fvg

    from pride_spark import registry as reg
    from pride_spark.operators import fdr
    from pride_spark.session import get_spark

    spark = get_spark("fdr-slope")
    spark.sparkContext.setLogLevel("ERROR")

    scales = [("f50", args.sf50_dir), ("f100", args.sf100_dir)]
    out: dict = {"runs_per_point": args.runs}

    # ------------------------------------------------------------------
    # q45: cold (fixture build) vs warm (memo hit) at each scale
    # ------------------------------------------------------------------
    q45: dict = {}
    for label, sf_dir in scales:
        _drop_q45_fixture()
        t0 = time.time()
        reg.q45_sets_path(spark, sf_dir)
        t_build = round(time.time() - t0, 2)
        warm = []
        for _ in range(max(args.runs, 1)):
            t0 = time.time()
            n, h = fvg.spark_fingerprint(
                reg.q45_combined_fdr(spark, sf_dir), float_mode="bits"
            )
            warm.append(round(time.time() - t0, 2))
        q45[label] = {
            "rows": n,
            "sec_fixture_build": t_build,
            "sec_warm_runs": warm,
            "sec_warm_best": min(warm),
        }
        print(f"q45 {label}: build {t_build}s, warm {warm}", flush=True)
    q45["alpha_warm_f50_to_f100"] = round(
        math.log2(q45["f100"]["sec_warm_best"] / q45["f50"]["sec_warm_best"]), 2
    )
    q45["alpha_build_f50_to_f100"] = round(
        math.log2(
            q45["f100"]["sec_fixture_build"] / q45["f50"]["sec_fixture_build"]
        ),
        2,
    )
    out["q45_combined_fdr"] = q45

    # ------------------------------------------------------------------
    # q03: phase-instrumented runs at each scale
    # ------------------------------------------------------------------
    q03: dict = {}
    for label, sf_dir in scales:
        best_total, best_phases = None, None
        for _ in range(max(args.runs, 1)):
            fdr.PHASE_LOG = []
            t0 = time.time()
            n, h = fvg.spark_fingerprint(
                reg.q03_fdr_qvalue(spark, sf_dir), float_mode="bits"
            )
            total = round(time.time() - t0, 2)
            phases = dict(fdr.PHASE_LOG)
            fdr.PHASE_LOG = None
            if best_total is None or total < best_total:
                best_total, best_phases = total, phases
        tail = round(best_total - sum(best_phases.values()), 2)
        q03[label] = {
            "rows": n,
            "sec_total_best": best_total,
            "phases": best_phases,
            "sec_repair_and_fingerprint_tail": tail,
        }
        print(f"q03 {label}: total {best_total}s, phases {best_phases}, "
              f"tail {tail}s", flush=True)
    q03["alpha_total_f50_to_f100"] = round(
        math.log2(q03["f100"]["sec_total_best"] / q03["f50"]["sec_total_best"]), 2
    )
    q03["alpha_per_phase"] = {
        ph: round(
            math.log2(
                max(q03["f100"]["phases"].get(ph, 0.0), 0.01)
                / max(q03["f50"]["phases"].get(ph, 0.0), 0.01)
            ),
            2,
        )
        for ph in q03["f50"]["phases"]
    }
    out["q03_fdr_qvalue"] = q03

    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
