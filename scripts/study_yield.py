"""Adversarial-yield study (VERDICT r3 item 6).

The reference pipeline's purpose is a high-yield generator of solvable
accident scenarios (`/root/reference/src/adv_scenario_gen.py:469-476`);
yield (adv/sol successes per feasible candidate) is a first-class quality
metric. This study runs the flagship pipeline on FIXED scenes + seeds
(synthetic data is split-seeded; model PRNG is PRNGKey(0)) while sweeping
the optimization budget, learning rate, and open- vs closed-loop planner,
and reports the success-rate curve — distinguishing an optimization-budget
artifact from a config ceiling or a loss/planner bug.

Usage:
    python scripts/study_yield.py --cfg configs/adv_gen_synth_hc_prod.cfg \
        --out out/yield_study \
        --sweep 200:0.05:hardcode 400:0.05:hardcode 800:0.05:hardcode \
                200:0.1:hardcode 200:0.05:ego

Writes a markdown table to stdout and yield_study.json under --out.
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.join(os.path.dirname(__file__), "..")

SUMMARY_KEYS = ("candidates", "feasible", "adv_success", "sol_success",
                "planner_precollide")


def run_one(cfg, out_dir, num_iters, lr, planner, extra):
    cmd = [sys.executable, os.path.join(REPO, "scripts/adv_scenario_gen.py"),
           "-c", cfg, "--out", out_dir, "--num_iters", str(num_iters),
           "--lr", str(lr), "--planner", planner] + extra
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        raise RuntimeError(f"pipeline iters={num_iters} lr={lr} "
                           f"planner={planner} failed")
    return r.stdout, wall


def parse_summary(stdout):
    out = {}
    for k in SUMMARY_KEYS:
        m = re.search(rf"^{k} = (\d+)", stdout, re.M)
        out[k] = int(m.group(1)) if m else None
    m = re.search(r"total time: ([\d.]+) sec \(([\d.]+) scenarios/hour\)",
                  stdout)
    if m:
        out["total_time_s"] = float(m.group(1))
        out["scenarios_per_hour"] = float(m.group(2))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        REPO, "configs/adv_gen_synth_hc_prod.cfg"))
    ap.add_argument("--sweep", nargs="+", required=True,
                    help="list of iters:lr:planner points, e.g. "
                         "200:0.05:hardcode 800:0.05:hardcode 200:0.05:ego")
    ap.add_argument("--out", default="out/yield_study")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra flags forwarded to adv_scenario_gen")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    rows = []
    for point in args.sweep:
        it_s, lr_s, planner = point.split(":")
        tag = f"it{it_s}_lr{lr_s}_{planner}"
        od = os.path.join(args.out, tag)
        print(f"[yield] running {tag} ...", flush=True)
        stdout, wall = run_one(args.cfg, od, int(it_s), float(lr_s),
                               planner, args.extra)
        row = {"num_iters": int(it_s), "lr": float(lr_s), "planner": planner,
               "wall_s": round(wall, 1), **parse_summary(stdout)}
        fe = row.get("feasible") or 0
        row["adv_rate"] = round(row["adv_success"] / fe, 3) if fe else None
        row["sol_rate"] = round(row["sol_success"] / fe, 3) if fe else None
        rows.append(row)
        print(f"[yield] {tag}: {row}", flush=True)

    hdr = ("| iters | lr | planner | feasible | adv | sol | adv rate | "
           "sol rate | wall (s) |")
    print(hdr)
    print("|" + "---|" * 9)
    for r in rows:
        print(f"| {r['num_iters']} | {r['lr']} | {r['planner']} | "
              f"{r['feasible']} | {r['adv_success']} | {r['sol_success']} | "
              f"{r['adv_rate']} | {r['sol_rate']} | {r['wall_s']} |")

    with open(os.path.join(args.out, "yield_study.json"), "w") as fh:
        json.dump(rows, fh, indent=2)
    print("wrote", os.path.join(args.out, "yield_study.json"))


if __name__ == "__main__":
    main()
