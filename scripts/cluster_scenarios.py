"""Cluster generated collision scenarios by collision geometry
(reference ``cluster_scenarios.py``): feature = [unit collision-direction
vector in the planner frame, attacker heading vector in the planner frame]
at the interpolated first-collision time; KMeans(k=10); polar scatter viz.
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from strive_tpu.data.scenario_json import read_adv_scenes
from strive_tpu.geometry import interp_traj, transform2frame
from strive_tpu.losses.metrics import check_single_veh_coll
from strive_tpu.utils.config import get_parser
from strive_tpu.utils.logger import Logger, mkdir


def parse_cfg(argv=None):
    parser = get_parser("Cluster scenarios")
    parser.add_argument("--out", type=str, default="./out/cluster_out")
    parser.add_argument("--scenario_dirs", type=str, nargs="+", required=True)
    parser.add_argument("--k", type=int, default=10)
    parser.add_argument("--viz", action="store_true", default=False)
    return parser.parse(argv)


def compute_coll_feat(lw, scene_traj, dt):
    """Reference ``cluster_scenarios.py:76-117``; returns None if the
    scenario contains no collision."""
    import jax.numpy as jnp

    planner = scene_traj[0, :, :4]
    others = scene_traj[1:, :, :4]
    interp_scale = 5
    pl_i = np.asarray(interp_traj(jnp.asarray(planner)[None], interp_scale))[0]
    ot_i = np.asarray(interp_traj(jnp.asarray(others), interp_scale))
    coll, coll_t = check_single_veh_coll(pl_i, lw[0], ot_i, lw[1:])
    if coll.sum() == 0:
        return None
    coll_t = coll_t[coll]
    agts = np.nonzero(coll)[0]
    plan_states = pl_i[coll_t]            # (NC, 4)
    atk_states = ot_i[coll, coll_t]       # (NC, 4)
    first = int(np.argmin(coll_t))
    local = np.asarray(transform2frame(
        jnp.asarray(plan_states), jnp.asarray(atk_states)[:, None]
    ))[first, 0]
    hvec = [float(local[2]), float(local[3])]
    pos = local[:2] / max(np.linalg.norm(local[:2]), 1e-9)
    return {"hvec": hvec, "angvec": pos.tolist()}


def semantic_cluster_name(center):
    """Human-readable collision-type name for one KMeans center.

    The reference hand-labels its 10 clusters
    (``data/clustering/cluster_labels.txt``: 'Merge from Right, Head On,
    Behind, Cutoff Left & Front, T-Bone Left, ...'); we derive names of the
    same vocabulary from the center's geometry. The 4-D feature is
    [angvec (unit planner->attacker direction at collision, planner frame),
    hvec (attacker heading, planner frame)] (``cluster_scenarios.py:76-117``;
    planner frame: +x forward, +y left).
    """
    ax, ay, hx, hy = [float(v) for v in center]
    a = np.degrees(np.arctan2(ay, ax))    # where the attacker hits from
    h = np.degrees(np.arctan2(hy, hx))    # attacker heading vs planner's
    side = "Left" if ay > 0 else "Right"
    if abs(a) <= 45.0:          # impact at the front
        if abs(h) >= 135.0:
            return "Head On"
        if abs(h) <= 45.0:
            return "Cutoff " + side + " & Front"
        return "Front from " + side
    if abs(a) >= 135.0:         # impact from behind
        return "Behind"
    # impact on the flank
    if abs(h) <= 45.0:
        return "Merge from " + side
    return "T-Bone " + side


def write_cluster_labels(clustering, out_dir):
    """Auto-derived semantic names, one per cluster, comma-separated —
    consumable by ``eval_adv_gen.py --cluster_labels`` (same format as the
    reference's hand-written ``cluster_labels.txt``). Duplicate names get
    a numeric suffix so the label set stays unambiguous."""
    names = [semantic_cluster_name(c) for c in clustering.cluster_centers_]
    seen = {}
    for i, n in enumerate(names):
        seen[n] = seen.get(n, 0) + 1
        if seen[n] > 1:
            names[i] = f"{n} ({seen[n]})"
    path = os.path.join(out_dir, "cluster_labels.txt")
    with open(path, "w") as f:
        f.write(", ".join(names))
    return path, names


def main(argv=None):
    cfg = parse_cfg(argv)
    cfg.out = cfg.out + "_" + str(int(time.time()))
    mkdir(cfg.out)
    Logger.init(os.path.join(cfg.out, "cluster_log.txt"))

    scenes = []
    for d in cfg.scenario_dirs:
        scenes += read_adv_scenes(d)
    Logger.log(f"Loaded {len(scenes)} scenarios")

    feats, names = [], []
    for si, sc in enumerate(scenes):
        f = compute_coll_feat(np.asarray(sc["veh_att"]),
                              np.asarray(sc["scene_fut"]), sc["dt"])
        if f is None:
            Logger.log(f"{sc['name']}: no collision, skipping")
            continue
        feats.append(f)
        names.append("%04d_%s" % (si, sc["name"]))

    if len(feats) < cfg.k:
        Logger.log(f"Only {len(feats)} collision scenarios; need >= k={cfg.k}")
        if not feats:
            return None

    angvec = np.array([f["angvec"] for f in feats])
    hvec = np.array([f["hvec"] for f in feats])
    X = np.concatenate([angvec, hvec], axis=1)

    from sklearn.cluster import KMeans

    k = min(cfg.k, len(feats))
    clustering = KMeans(n_clusters=k, random_state=0, n_init=10).fit(X)
    labels = clustering.labels_
    with open(os.path.join(cfg.out, "cluster.pkl"), "wb") as f:
        pickle.dump(clustering, f)
    labels_path, label_names = write_cluster_labels(clustering, cfg.out)
    Logger.log("cluster labels: " + ", ".join(label_names)
               + " -> " + labels_path)

    fig, axs = plt.subplots(1, 2, figsize=(10, 5))
    th = np.linspace(0, 2 * np.pi, 100)
    for ax, title in zip(axs, ("collision direction", "adversary heading")):
        ax.plot(np.cos(th), np.sin(th), "--b", alpha=0.15)
        ax.set_title(title)
        ax.axis("equal")
    for ki in np.unique(labels):
        axs[0].plot(angvec[labels == ki, 0], angvec[labels == ki, 1], "o",
                    markersize=4)
        axs[1].plot(hvec[labels == ki, 0], hvec[labels == ki, 1], "o",
                    markersize=4)
    plt.savefig(os.path.join(cfg.out, "cluster_k%d.jpg" % k))
    plt.close(fig)
    Logger.log(f"Clustered {len(feats)} scenarios into {k} groups -> "
               f"{cfg.out}")
    return clustering


if __name__ == "__main__":
    main()
