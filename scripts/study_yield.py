"""Adversarial-yield study (VERDICT r3 item 6).

The reference's purpose is a high-yield accident-scenario generator
(`/root/reference/src/adv_scenario_gen.py:469-476`); yield =
adv_success / feasible is a first-class quality metric. This study runs
the SAME candidate scenes (synthetic dataset is seeded, seed=0) through
the flagship pipeline while sweeping the optimization budget
(`--num_iters`), learning rate (`--lr`), and open- vs closed-loop
planner (`--planner ego` replay vs `--planner hardcode`; reference
budgets: 200 iters rule-based / 300 replay, lr 0.05 —
`configs/adv_gen_rule_based.cfg:27-28`, `configs/adv_gen_replay.cfg:26-27`),
and reports the success-rate curve.

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


def run_point(name, out_dir, cfg, flags):
    cmd = [sys.executable, os.path.join(REPO, "scripts/adv_scenario_gen.py"),
           "-c", cfg, "--out", out_dir] + flags
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-3000:] + r.stderr[-3000:])
        raise RuntimeError(f"pipeline point {name} failed")
    return parse_summary(r.stdout), wall


def parse_summary(stdout):
    out = {}
    for k in SUMMARY_KEYS:
        m = re.search(rf"^{k} = (\d+)", stdout, re.M)
        if m:
            out[k] = int(m.group(1))
    m = re.search(r"total time: ([\d.]+) sec", stdout)
    if m:
        out["pipeline_sec"] = float(m.group(1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        REPO, "configs/adv_gen_synth_hc_prod.cfg"))
    ap.add_argument("--out", default="out/yield_study")
    ap.add_argument("--max_scenes", type=int, default=None,
                    help="bound candidate count per point (fixed seed keeps "
                         "the scene set identical across points)")
    ap.add_argument("--points", nargs="+", default=[
        "closed_it200:",
        "closed_it400:--num_iters 400",
        "closed_it800:--num_iters 800",
        "closed_lr010:--lr 0.1",
        "open_it200:--planner ego",
        "open_it400:--planner ego --num_iters 400",
    ], help="name:space-separated-extra-flags")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    results = {}
    for spec in args.points:
        name, _, flagstr = spec.partition(":")
        flags = flagstr.split() if flagstr else []
        if args.max_scenes:
            flags += ["--max_scenes", str(args.max_scenes)]
        od = os.path.join(args.out, name)
        summary, wall = run_point(name, od, args.cfg, flags)
        feas = summary.get("feasible", 0)
        summary["yield_pct"] = round(
            100.0 * summary.get("adv_success", 0) / feas, 1) if feas else 0.0
        summary["wall_sec"] = round(wall, 1)
        results[name] = summary
        print(f"[{name}] {summary}")
        with open(os.path.join(args.out, "yield_study.json"), "w") as fh:
            json.dump(results, fh, indent=2)

    print("\n| point | candidates | feasible | adv | sol | yield % | "
          "pipeline s |")
    print("|---|---|---|---|---|---|---|")
    for name, s in results.items():
        print(f"| {name} | {s.get('candidates', '?')} | "
              f"{s.get('feasible', '?')} | {s.get('adv_success', '?')} | "
              f"{s.get('sol_success', '?')} | {s.get('yield_pct', '?')} | "
              f"{s.get('pipeline_sec', '?')} |")
    print("wrote", os.path.join(args.out, "yield_study.json"))


if __name__ == "__main__":
    main()
