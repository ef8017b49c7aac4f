"""Adversarial scenario generation — the flagship pipeline.

Reference ``adv_scenario_gen.py``: sample prior futures -> feasibility
filter -> batch feasible scenes -> init optimization (fit nuScenes / planner
rollout) -> adversarial latent optimization (open- or closed-loop) ->
success check -> solution optimization -> save scenario JSONs into the
{adv_sol_success, sol_failed, adv_failed} taxonomy + viz.

TPU-native differences: scenes are batched as fixed-shape padded arrays
(batch_size = number of scenes, not ΣNA), every optimization loop is one
jit-compiled Adam scan, and the closed-loop planner re-rolls on the host
between jitted chunks (reference-exact at the default refresh of 1
iteration; see strive_tpu.optim.adv).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from strive_tpu.data.loading import load_environment
from strive_tpu.data.scenario_json import prepare_output_dict, save_scenario
from strive_tpu.losses.metrics import check_single_veh_coll
from strive_tpu.optim import (
    compute_adv_gen_success,
    compute_sol_success,
    determine_feasibility,
    restrict_attackers_to_category,
    run_adv_gen_optim,
    run_find_solution_optim,
    run_init_optim,
)
from strive_tpu.planners import PLANNER_CONFIGS, PlannerConfig, RulePlanner
from strive_tpu.planners.host_bridge import make_planner_host_fn
from strive_tpu.planners.tpu_planner import TpuRulePlanner
from strive_tpu.utils.checkpoint import load_state
from strive_tpu.utils.config import add_base_args, get_parser
from strive_tpu.utils.logger import Logger, mkdir
from strive_tpu.viz import get_adv_coloring, render_scene

from train_traffic import build_model
from strive_tpu.model.traffic_model import init_model_params


def parse_cfg(argv=None):
    parser = get_parser("Adversarial scenario generation (TPU)")
    parser = add_base_args(parser)
    parser.add_argument("--split", type=str, default="val",
                        choices=["test", "val", "train"])
    parser.add_argument("--val_size", type=int, default=400)
    parser.add_argument("--seq_interval", type=int, default=10)
    parser.add_argument("--shuffle", action="store_true", default=False)
    parser.add_argument("--random_val", action="store_true", default=True)
    parser.add_argument("--adv_attack_with", type=str, default=None)
    parser.add_argument("--planner", type=str, default="ego",
                        choices=["ego", "hardcode"])
    parser.add_argument("--planner_cfg", type=str, default="default")
    parser.add_argument("--planner_backend", type=str, default="host",
                        choices=["host", "tpu"],
                        help="'host': numpy phase-A planner re-rolled "
                             "between jitted chunks (reference-exact); "
                             "'tpu': device phase-B planner (fast path: "
                             "its own compiled program called between "
                             "chunks; see --closed_loop_mode)")
    parser.add_argument("--closed_loop_mode", type=str, default="fused",
                        choices=["chunked", "fused"],
                        help="'fused' (default, tpu backend only): "
                             "planner traced INTO one compiled loop — "
                             "zero host hops, the measured-fastest "
                             "closed loop (PERF.md r4: 15.7 vs 12.8 "
                             "it/s chunked). 'chunked': planner "
                             "re-rolls eagerly between jitted chunks "
                             "every --planner_refresh_every iterations "
                             "(reference-exact at 1; both modes are "
                             "equivalence-tested per k in "
                             "tests/test_optim.py). The host backend "
                             "always runs chunked.")
    parser.add_argument("--planner_refresh_every", type=int, default=1,
                        help="re-roll the closed-loop planner every k-th "
                             "Adam iteration (1 = reference-exact; the "
                             "perf/quality curve is measured in PERF.md)")
    parser.add_argument("--feasibility_thresh", type=float, default=10.0)
    parser.add_argument("--feasibility_time", type=int, default=4)
    parser.add_argument("--feasibility_vel", type=float, default=0.5)
    parser.add_argument("--feasibility_infront_min", type=float, default=0.0)
    parser.add_argument("--feasibility_check_sep", action="store_true",
                        default=False)
    parser.add_argument("--init_loss_match_ext", type=float, default=10.0)
    parser.add_argument("--init_loss_motion_prior_ext", type=float, default=0.1)
    parser.add_argument("--loss_coll_veh", type=float, default=20.0)
    parser.add_argument("--loss_coll_veh_plan", type=float, default=20.0)
    parser.add_argument("--loss_coll_env", type=float, default=20.0)
    parser.add_argument("--loss_init_z", type=float, default=0.5)
    parser.add_argument("--loss_init_z_atk", type=float, default=0.05)
    parser.add_argument("--loss_motion_prior", type=float, default=1.0)
    parser.add_argument("--loss_motion_prior_atk", type=float, default=0.005)
    parser.add_argument("--loss_motion_prior_ext", type=float, default=0.0001)
    parser.add_argument("--loss_match_ext", type=float, default=10.0)
    parser.add_argument("--loss_adv_crash", type=float, default=2.0)
    parser.add_argument("--sol_future_len", type=int, default=16)
    parser.add_argument("--sol_loss_coll_veh", type=float, default=10.0)
    parser.add_argument("--sol_loss_coll_env", type=float, default=10.0)
    parser.add_argument("--sol_loss_motion_prior", type=float, default=0.005)
    parser.add_argument("--sol_loss_init_z", type=float, default=0.0)
    parser.add_argument("--sol_loss_motion_prior_ext", type=float,
                        default=0.001)
    parser.add_argument("--sol_loss_match_ext", type=float, default=10.0)
    parser.add_argument("--num_iters", type=int, default=300)
    parser.add_argument("--lr", type=float, default=0.05)
    parser.add_argument("--num_samples", type=int, default=20)
    parser.add_argument("--viz", action="store_true", default=False)
    parser.add_argument("--save", action="store_true", default=False)
    parser.add_argument("--synth_scenes", type=int, default=24)
    parser.add_argument("--max_scenes", type=int, default=None,
                        help="cap on candidate scenes (for smoke runs)")
    parser.add_argument("--mesh_devices", type=int, default=1,
                        help="shard scene batches over this many devices "
                             "(embarrassingly parallel scenario "
                             "optimization, SURVEY 2.2)")
    parser.add_argument("--no_ref_compat", dest="ref_compat",
                        action="store_false", default=True,
                        help="fix the reference TgtMatchingLoss prior-weight "
                             "bug instead of replicating it (PARITY.md)")
    return parser.parse(argv)


def main(argv=None):
    cfg = parse_cfg(argv)
    mkdir(cfg.out)
    Logger.init(os.path.join(cfg.out, "adv_gen_log.txt"))
    Logger.log("Args: " + str(vars(cfg)))

    need_lanes = cfg.planner == "hardcode"
    ds, store, lane_graphs, state_norm, att_norm = load_environment(
        cfg, cfg.split, load_lanegraph=need_lanes
    )
    from strive_tpu.normalize import REDUCED_CAT, effective_categories
    eff_cats = effective_categories(cfg.agent_types, cfg.reduce_cats)
    nc = len(eff_cats)
    if cfg.adv_attack_with is not None and \
            cfg.adv_attack_with not in eff_cats and \
            not (cfg.reduce_cats and
                 REDUCED_CAT.get(cfg.adv_attack_with) in eff_cats):
        # fail fast on a typo'd category — a silent all-False restriction
        # would just produce zero scenarios with no explanation
        raise SystemExit(
            f"--adv_attack_with {cfg.adv_attack_with!r} is not in the "
            f"effective category set {eff_cats} (nor reduces into it)")
    model = build_model(cfg, state_norm, att_norm, nc)
    dt = 0.5

    key = jax.random.PRNGKey(0)
    init_batch = ds.get_batch([0])
    params = init_model_params(model, init_batch, store, key)
    if cfg.ckpt is not None:
        params, _, _, _ = load_state(cfg.ckpt, params, None)
        Logger.log("Loaded checkpoint %s" % cfg.ckpt)

    loss_weights = {
        "coll_veh": cfg.loss_coll_veh, "coll_veh_plan": cfg.loss_coll_veh_plan,
        "coll_env": cfg.loss_coll_env, "init_z": cfg.loss_init_z,
        "init_z_atk": cfg.loss_init_z_atk,
        "motion_prior": cfg.loss_motion_prior,
        "motion_prior_atk": cfg.loss_motion_prior_atk,
        "motion_prior_ext": cfg.loss_motion_prior_ext,
        "match_ext": cfg.loss_match_ext, "adv_crash": cfg.loss_adv_crash,
    }
    init_weights = {"match_ext": cfg.init_loss_match_ext,
                    "motion_prior_ext": cfg.init_loss_motion_prior_ext}
    sol_weights = {"coll_veh": cfg.sol_loss_coll_veh,
                   "coll_env": cfg.sol_loss_coll_env,
                   "motion_prior": cfg.sol_loss_motion_prior,
                   "init_z": cfg.sol_loss_init_z,
                   "motion_prior_ext": cfg.sol_loss_motion_prior_ext,
                   "match_ext": cfg.sol_loss_match_ext}

    @jax.jit
    def sample_fn(params, scene, rng):
        return model.apply(params, scene, store, cfg.num_samples, rng, True,
                           method="sample_batched")

    @jax.jit
    def embed_fn(params, scene):
        return model.apply(params, scene, store, method="embed")

    viz_dir = os.path.join(cfg.out, "viz_results")
    scen_dir = os.path.join(cfg.out, "scenario_results")
    if cfg.viz:
        mkdir(viz_dir)
    if cfg.save:
        mkdir(scen_dir)

    mesh = None
    if cfg.mesh_devices > 1:
        from strive_tpu.parallel.mesh import make_mesh, shard_batch

        mesh = make_mesh(cfg.mesh_devices)
        Logger.log(f"Sharding scene batches over {cfg.mesh_devices} devices "
                   f"({jax.devices()[0].platform})")
    else:
        shard_batch = None

    # ONE planner instance for the whole run: the fused bridge fn is
    # memoized on it, so the adversarial runner cache stays hot across
    # batches (per-batch planner state is threaded through as arguments).
    planner = None
    if cfg.planner == "hardcode":
        pc = PlannerConfig(**PLANNER_CONFIGS[cfg.planner_cfg])
        if cfg.planner_backend == "tpu":
            # HBM guard (CLAUDE.md / PERF.md r4): the FUSED closed loop's
            # others-phase transients scale with the PER-DEVICE batch x
            # others_chunk; 4 x 16 measured fatal (wedges the remote TPU
            # worker). Size the chunk so b_local x chunk <= 32 and refuse
            # the measured-fatal >= 64 zone for fused mode only (chunked
            # re-rolls the planner standalone and never hit the pathology;
            # mesh-sharded runs split the batch over devices first).
            b_local = -(-cfg.batch_size // max(cfg.mesh_devices, 1))
            chunk = max(1, min(8, 32 // max(b_local, 1)))
            if cfg.closed_loop_mode == "fused" and b_local * chunk >= 64:
                raise SystemExit(
                    f"per-device B x others_chunk = {b_local * chunk} >= "
                    "64: measured-fatal ceiling for the fused closed loop "
                    "(PERF.md r4). Lower --batch_size, raise "
                    "--mesh_devices, or use --closed_loop_mode chunked.")
            planner = TpuRulePlanner(lane_graphs, store.map_names, pc,
                                     others_chunk=chunk)
        else:
            planner = RulePlanner(lane_graphs, store.map_names, pc)

    stats = {"candidates": 0, "feasible": 0, "adv_success": 0,
             "sol_success": 0, "planner_precollide": 0}
    pending = []  # feasible scene indices awaiting a batch
    n_total = len(ds) if cfg.max_scenes is None else min(len(ds),
                                                         cfg.max_scenes)
    order = list(range(n_total))
    t_start = time.time()
    batch_times = []  # (secs, n_scenes, n_adv_success) per optimized batch

    for pos, di in enumerate(order):
        is_last = pos == len(order) - 1
        scene = ds.get_batch([di])
        stats["candidates"] += 1
        key, k1 = jax.random.split(key)
        samp = sample_fn(params, scene, k1)

        # ego velocity screens (reference :176-195)
        if cfg.planner == "ego":
            ego_gt = np.asarray(state_norm.unnormalize(scene.future_gt[0, 0]))
            vmax = np.linalg.norm(np.diff(ego_gt[:, :2], axis=0), axis=-1).max()
        else:
            ego_s = np.asarray(state_norm.unnormalize(
                samp["future_pred"][0, :, 0]))
            vmax = np.linalg.norm(np.diff(ego_s[:, :, :2], axis=1),
                                  axis=-1).max()
        if vmax < cfg.feasibility_vel:
            Logger.log(f"scene {di}: ego below velocity threshold, skip")
            if not (is_last and pending):
                continue
        else:
            feas, feas_t, feas_d = determine_feasibility(
                samp["future_pred"][0], scene.mask[0], state_norm,
                cfg.feasibility_thresh, cfg.feasibility_time, 0.0,
                feasibility_infront_min=cfg.feasibility_infront_min,
                check_non_drivable_separation=cfg.feasibility_check_sep,
                drivable=store.drivable(), dx=store.dx,
                map_idx=scene.map_idx[0],
            )
            if cfg.adv_attack_with is not None:
                # restrict candidate attackers to one category (reference
                # adv_scenario_gen.py:209-219); sem one-hots index the
                # EFFECTIVE (possibly reduced) category set
                feas = restrict_attackers_to_category(
                    feas, scene.sem[0], eff_cats, cfg.adv_attack_with,
                    reduced=cfg.reduce_cats)
            n_feas = int(np.asarray(feas).sum())
            if int(scene.num_agents()[0]) <= 1 or n_feas == 0:
                Logger.log(f"scene {di}: infeasible, skip")
                if not (is_last and pending):
                    continue
            else:
                stats["feasible"] += 1
                pending.append(di)
                Logger.log(f"scene {di}: feasible "
                           f"({n_feas} candidate attackers)")

        if len(pending) < cfg.batch_size and not is_last:
            continue
        if not pending:
            continue

        batch_ids = pending
        pending = []

        def get_padded_batch(ids):
            """Batch `ids`; with a mesh, pad B to a device multiple with
            fully-masked scenes (losses are mask-defensive) and shard the
            scene axis (SURVEY §2.2: embarrassingly parallel)."""
            sc = ds.get_batch(ids)
            if mesh is None:
                return sc
            pad = (-sc.B) % int(mesh.devices.size)
            if pad:
                idx = np.array(list(range(sc.B)) + [0] * pad)
                sc = jax.tree_util.tree_map(lambda x: x[idx], sc)
                mask = np.asarray(sc.mask).copy()
                mask[len(ids):] = False
                sc = sc.replace(mask=jnp.asarray(mask))
            return shard_batch(sc, mesh)

        def stage1_fit(sc):
            """Embed + fit the recorded scene (reference :283-290)."""
            emb = embed_fn(params, sc)
            prior = emb["prior_out"]
            z0 = emb["posterior_out"][0]
            init_traj = sc.future_gt
            z0, fit, _ = run_init_optim(
                model, params, z0, init_traj, sc.future_vis, 0.1,
                init_weights, sc, store, 75, emb, prior,
                ref_compat=cfg.ref_compat,
            )
            return emb, prior, z0, init_traj, fit

        def make_pfn(sc):
            """Reset the planner on the batch and return the closed-loop
            bridge ``(fn, planner_state)`` (host numpy: state is None and
            fn is single-arg; fused device: state is the per-batch pytree
            the two-arg fn consumes — --planner_backend)."""
            init_state = np.asarray(state_norm.unnormalize(
                sc.past_gt[:, :, -1]))
            lw_un = np.asarray(att_norm.unnormalize(sc.lw))
            if cfg.planner_backend == "tpu":
                planner.reset(init_state, lw_un, np.asarray(sc.mask),
                              np.asarray(sc.map_idx))
                return (planner.make_fused_fn(state_norm, dt,
                                              cfg.future_len),
                        planner.state)
            mask_np = np.asarray(sc.mask)
            flat_states, flat_lw, batch_of = [], [], []
            for b in range(sc.B):
                # fully-masked padding scenes (mesh batch padding) still
                # contribute their ego row so the planner has an 'ego'
                # object per scene; their rollouts are dropped with the
                # rest of the padded results (ADVICE r2)
                n = max(int(mask_np[b].sum()), 1)
                flat_states.append(init_state[b, :n])
                flat_lw.append(lw_un[b, :n])
                batch_of.extend([b] * n)
            planner.reset(np.concatenate(flat_states),
                          np.concatenate(flat_lw), np.array(batch_of), sc.B,
                          np.asarray(sc.map_idx))
            return (make_planner_host_fn(planner, sc.mask, state_norm, dt,
                                         cfg.future_len), None)

        def planner_refit(sc, emb, prior, z0, fit):
            """(Re)set the rule planner for the batch, roll it on the fitted
            scene, replace the ego target, and re-fit 100 iters
            (reference :292-310)."""
            pfn, pstate = make_pfn(sc)
            planner_init = pfn(fit, pstate) if pstate is not None else pfn(fit)
            init_traj_np = np.array(np.asarray(sc.future_gt))
            init_traj_np[:, 0, :, :4] = np.asarray(planner_init)
            init_traj = jnp.asarray(init_traj_np)
            z0, fit, _ = run_init_optim(
                model, params, z0, init_traj, sc.future_vis, cfg.lr,
                init_weights, sc, store, 100, emb, prior,
                ref_compat=cfg.ref_compat,
            )
            return (pfn, pstate), init_traj, z0, fit

        scene = get_padded_batch(batch_ids)
        B = scene.B
        Logger.log(f"Optimizing batch of {len(batch_ids)} scenes "
                   f"{batch_ids}" + (f" (padded to {B})" if B
                                     != len(batch_ids) else ""))
        t0 = time.time()

        emb, prior, z_init, init_traj, init_fit = stage1_fit(scene)

        planner_fn, planner_state = None, None
        if cfg.planner == "hardcode":
            (planner_fn, planner_state), init_traj, z_init, init_fit = \
                planner_refit(scene, emb, prior, z_init, init_fit)
            # drop scenes where the planner already collides (reference :312-328)
            lw_un = np.asarray(att_norm.unnormalize(scene.lw))
            mask_np = np.asarray(scene.mask)
            keep = []
            for b in range(len(batch_ids)):
                n = int(mask_np[b].sum())
                fut = np.asarray(state_norm.unnormalize(init_fit[b, :n]))
                lw_b = lw_un[b, :n]
                coll, _ = check_single_veh_coll(fut[0], lw_b[0], fut[1:],
                                                lw_b[1:])
                keep.append(coll.sum() == 0)
            if not all(keep):
                stats["planner_precollide"] += int(len(keep) - sum(keep))
                Logger.log("Planner pre-collision: dropping "
                           f"{len(keep) - sum(keep)}/{len(keep)} scenes")
                if not any(keep):
                    continue
                batch_ids = [bi for bi, k in zip(batch_ids, keep) if k]
                scene = get_padded_batch(batch_ids)
                B = scene.B
                emb, prior, z_init, init_traj, init_fit = stage1_fit(scene)
                (planner_fn, planner_state), init_traj, z_init, init_fit = \
                    planner_refit(scene, emb, prior, z_init, init_fit)

        # record the init scenario (ego = data / planner, reference :358-366)
        init_future_pred = np.array(np.asarray(init_fit))
        init_future_pred[:, 0] = np.asarray(init_traj[:, 0, :, :4])

        # adversarial optimization
        tgt_prior = (prior[0][:, 0], prior[1][:, 0])
        z_adv, final_traj, min_agt, min_t, _, internal_pred = run_adv_gen_optim(
            model, params, z_init, cfg.lr, loss_weights, scene, store,
            cfg.num_iters, emb, cfg.planner, tgt_prior, prior,
            cfg.feasibility_time, cfg.feasibility_infront_min,
            planner_rollout_fn=planner_fn, ref_compat=cfg.ref_compat,
            closed_loop_mode=(cfg.closed_loop_mode
                              if cfg.planner_backend == "tpu"
                              else "chunked"),
            planner_state=planner_state,
            planner_refresh_every=cfg.planner_refresh_every,
        )
        min_agt = np.asarray(min_agt)
        min_t = np.asarray(min_t)

        real_B = len(batch_ids)
        adv_ok = []
        for b in range(real_B):
            ok, _, _ = compute_adv_gen_success(
                final_traj[b], state_norm, att_norm, scene.lw[b],
                scene.mask[b], int(min_agt[b]),
            )
            adv_ok.append(ok)
        stats["adv_success"] += sum(adv_ok)
        Logger.log(f"adv successes: {adv_ok}")

        # solution optimization on successful scenes
        sol_ok = [False] * real_B
        sol_traj_store = {}
        sol_z_store = {}
        sol_ids = [b for b in range(real_B) if adv_ok[b]]
        if sol_ids:
            sel = list(sol_ids)
            if mesh is not None:
                # pad the sub-batch to a device multiple (masked rows are
                # ignored downstream) and shard it like the main batch
                sel = sel + [sol_ids[0]] * ((-len(sol_ids))
                                            % int(mesh.devices.size))
            sub = jax.tree_util.tree_map(
                lambda x: x[np.array(sel)], scene)
            sub_emb = jax.tree_util.tree_map(
                lambda x: x[np.array(sel)], emb)
            if mesh is not None and len(sel) > len(sol_ids):
                mask = np.asarray(sub.mask).copy()
                mask[len(sol_ids):] = False
                sub = sub.replace(mask=jnp.asarray(mask))
            if mesh is not None:
                sub = shard_batch(sub, mesh)
            sub_prior = sub_emb["prior_out"]
            z_sol, sol_traj, _ = run_find_solution_optim(
                model, params, z_adv[np.array(sel)],
                final_traj[np.array(sel)], cfg.sol_future_len, cfg.lr,
                sol_weights, sub, store, cfg.num_iters, sub_emb,
                sub_prior, sub_prior, ref_compat=cfg.ref_compat,
            )
            for k, b in enumerate(sol_ids):
                ok = compute_sol_success(
                    sol_traj[k], jax.tree_util.tree_map(
                        lambda x: x[k : k + 1], sub),
                    store, state_norm, att_norm,
                )
                sol_ok[b] = ok
                sol_traj_store[b] = np.asarray(sol_traj[k])
                sol_z_store[b] = np.asarray(z_sol[k])
            stats["sol_success"] += sum(sol_ok)
        Logger.log(f"sol successes: {sol_ok}")
        batch_secs = time.time() - t0
        batch_times.append((batch_secs, real_B, int(sum(adv_ok))))
        Logger.log("Optimized batch in %.1f sec" % batch_secs)

        # save + viz per scene
        mask_np = np.asarray(scene.mask)
        for b in range(real_B):
            n = int(mask_np[b].sum())
            result_dir = ("adv_failed" if not adv_ok[b]
                          else ("adv_sol_success" if sol_ok[b]
                                else "sol_failed"))
            if cfg.save:
                outd = os.path.join(scen_dir, result_dir)
                sc = {"past_gt": np.asarray(scene.past_gt[b, :n]),
                      "lw": np.asarray(scene.lw[b, :n]),
                      "sem": np.asarray(scene.sem[b, :n])}
                out_dict = prepare_output_dict(
                    sc, int(scene.map_idx[b]), store.map_names, dt,
                    state_norm, att_norm,
                    init_future_pred[b, :n],
                    np.asarray(final_traj[b, :n]),
                    sol_fut_traj=(sol_traj_store[b][:n] if adv_ok[b]
                                  else None),
                    attack_agt=int(min_agt[b]), attack_t=int(min_t[b]),
                    adv_z=np.asarray(z_adv[b, :n]),
                    sol_z=(sol_z_store[b][:n] if adv_ok[b] else None),
                    prior_distrib=(prior[0][b, :n], prior[1][b, :n]),
                    internal_ego_traj=np.asarray(internal_pred[b, 0]),
                )
                save_scenario(outd, "scene_%04d" % batch_ids[b], out_dict)
            if cfg.viz:
                outv = os.path.join(viz_dir, result_dir)
                colors = get_adv_coloring(n, int(min_agt[b]), 0)
                past_un = np.asarray(state_norm.unnormalize(
                    scene.past_gt[b, :n]))
                lw_b = np.asarray(att_norm.unnormalize(scene.lw[b, :n]))
                render_scene(
                    os.path.join(outv, "scene_%04d_before.jpg" % batch_ids[b]),
                    store, int(scene.map_idx[b]), past_un,
                    np.asarray(state_norm.unnormalize(
                        jnp.asarray(init_future_pred[b, :n]))),
                    lw_b, scene.mask[b, :n], car_colors=colors,
                    title="before (init)",
                )
                render_scene(
                    os.path.join(outv, "scene_%04d_after.jpg" % batch_ids[b]),
                    store, int(scene.map_idx[b]), past_un,
                    np.asarray(state_norm.unnormalize(final_traj[b, :n])),
                    lw_b, scene.mask[b, :n], car_colors=colors,
                    title="after (adversarial)",
                )
                if adv_ok[b]:
                    render_scene(
                        os.path.join(outv, "scene_%04d_sol.jpg" % batch_ids[b]),
                        store, int(scene.map_idx[b]), past_un,
                        np.asarray(state_norm.unnormalize(
                            jnp.asarray(sol_traj_store[b][:n]))),
                        lw_b, scene.mask[b, :n], car_colors=colors,
                        title="solution",
                    )

    elapsed = time.time() - t_start
    Logger.log("==== adv scenario generation done ====")
    for k, v in stats.items():
        Logger.log(f"{k} = {v}")
    Logger.log("total time: %.1f sec (%.2f scenarios/hour)" % (
        elapsed, stats["adv_success"] * 3600.0 / max(elapsed, 1e-9)))
    if len(batch_times) > 1:
        # steady-state throughput: drop the first batch (it pays the jit
        # compiles; runners are cached across batches, optim/loop.py) —
        # the north-star metric (BASELINE.md) at warm caches
        warm = batch_times[1:]
        secs = sum(t for t, _, _ in warm)
        scn = sum(b for _, b, _ in warm)
        adv = sum(a for _, _, a in warm)
        Logger.log(
            "steady state (excl. first batch): %.1f sec for %d scenes -> "
            "%.1f candidate scenarios/hour, %.1f adv-success/hour" % (
                secs, scn, scn * 3600.0 / max(secs, 1e-9),
                adv * 3600.0 / max(secs, 1e-9)))
    return stats


if __name__ == "__main__":
    main()
