"""Planner-refresh perf/quality study (VERDICT r2 item 2).

The closed-loop adversarial optimization re-rolls the rule-based planner
every Adam iteration in the reference (`adv_scenario_gen.py:381-476` via
`adv_gen_optim.py:133-139`). `--planner_refresh_every k` amortizes that
cost over k iterations. This study measures, per k:

- perf: fused closed-loop iters/sec (scripts/bench_closed_loop.py
  protocol, B=4 x NA=8, median of 3);
- quality: flagship-config pipeline outcomes (feasible / adv_success /
  sol_success counts) and the mean/max final-position divergence of the
  adversarial futures vs the k=1 (reference-exact) run on the SAME
  scenes and seeds.

Writes a markdown table to stdout and a JSON next to --out.
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.join(os.path.dirname(__file__), "..")


def run_pipeline(k, out_dir, cfg, extra):
    cmd = [sys.executable, os.path.join(REPO, "scripts/adv_scenario_gen.py"),
           "-c", cfg, "--planner_refresh_every", str(k),
           "--out", out_dir] + extra
    env = dict(os.environ,
               JAX_COMPILATION_CACHE_DIR=os.environ.get(
                   "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
        raise RuntimeError(f"pipeline k={k} failed")
    return r.stdout


def taxonomy_counts(out_dir):
    root = os.path.join(out_dir, "scenario_results")
    out = {}
    for d in ("adv_sol_success", "sol_failed", "adv_failed"):
        p = os.path.join(root, d)
        out[d] = len([f for f in os.listdir(p) if f.endswith(".json")]) \
            if os.path.isdir(p) else 0
    return out


def load_adv_futs(out_dir):
    """scenario name -> (N, FT, 4) fut_adv array, across all taxonomy dirs."""
    root = os.path.join(out_dir, "scenario_results")
    futs = {}
    for d in ("adv_sol_success", "sol_failed", "adv_failed"):
        p = os.path.join(root, d)
        if not os.path.isdir(p):
            continue
        for f in sorted(os.listdir(p)):
            if f.endswith(".json"):
                with open(os.path.join(p, f)) as fh:
                    sc = json.load(fh)
                futs[f] = np.asarray(sc["fut_adv"], dtype=np.float64)
    return futs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        REPO, "configs/adv_gen_synth_hc_full.cfg"))
    ap.add_argument("--ks", type=int, nargs="+", default=[1, 2, 5])
    ap.add_argument("--out", default="out/refresh_study")
    ap.add_argument("--skip_perf", action="store_true")
    ap.add_argument("--extra", nargs=argparse.REMAINDER, default=[],
                    help="extra flags forwarded to adv_scenario_gen")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    results = {}

    # --- perf: fused closed-loop it/s per k ---
    if not args.skip_perf:
        for k in args.ks:
            env = dict(os.environ, STRIVE_BENCH_REFRESH=str(k),
                       STRIVE_BENCH_MODES="fused")
            r = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "scripts/bench_closed_loop.py")],
                env=env, capture_output=True, text=True)
            line = [ln for ln in r.stdout.splitlines() if "fused" in ln]
            print(f"[perf k={k}] " + (line[-1] if line else r.stdout[-200:]))
            results.setdefault("perf", {})[k] = \
                line[-1] if line else r.stdout[-200:]

    # --- quality: pipeline outcomes + divergence vs k=1 ---
    futs_by_k = {}
    for k in args.ks:
        od = os.path.join(args.out, f"k{k}")
        run_pipeline(k, od, args.cfg, args.extra)
        counts = taxonomy_counts(od)
        futs_by_k[k] = load_adv_futs(od)
        results.setdefault("taxonomy", {})[k] = counts
        print(f"[quality k={k}] {counts}")

    base = futs_by_k.get(1) or futs_by_k[min(futs_by_k)]
    for k, futs in futs_by_k.items():
        common = sorted(set(base) & set(futs))
        divs = []
        for name in common:
            a, b = base[name], futs[name]
            n = min(a.shape[0], b.shape[0])
            divs.append(np.linalg.norm(
                a[:n, :, :2] - b[:n, :, :2], axis=-1))
        if divs:
            d = np.concatenate([x.ravel() for x in divs])
            results.setdefault("divergence_m", {})[k] = {
                "mean": float(d.mean()), "p95": float(np.percentile(d, 95)),
                "max": float(d.max()), "scenes": len(common)}
            print(f"[divergence k={k} vs 1] mean {d.mean():.3f} m, "
                  f"p95 {np.percentile(d, 95):.3f}, max {d.max():.3f} "
                  f"({len(common)} scenes)")

    with open(os.path.join(args.out, "refresh_study.json"), "w") as fh:
        json.dump(results, fh, indent=2, default=str)
    print("wrote", os.path.join(args.out, "refresh_study.json"))


if __name__ == "__main__":
    main()
