"""Lane graphs: nuScenes extraction (gated on the devkit) + synthetic grids.

Format (matches reference ``nuscenes_utils.py:50-122`` process_lanegraph):
``{'xy': (L, 2), 'in_edges': list[list[int]], 'out_edges': list[list[int]],
   'edges': (m, 5) = (x0, y0, hcos, hsin, len), 'edgeixes': (m, 2)}``
consumed by the rule-based planner.
"""

from __future__ import annotations

import numpy as np


def _build_edges(xys, out_edges, eps=1e-6):
    """Edge table from vertex positions + adjacency
    (reference ``nuscenes_utils.py:106-122``)."""
    edges, edgeixes = [], []
    ee2ix = {}
    for i, outs in enumerate(out_edges):
        x0, y0 = xys[i]
        for e in outs:
            x1, y1 = xys[e]
            d = np.array([x1 - x0, y1 - y0])
            dist = np.linalg.norm(d)
            assert dist > eps
            d = d / dist
            ee2ix[(i, e)] = len(edges)
            edges.append([x0, y0, d[0], d[1], dist])
            edgeixes.append([i, e])
    return (np.array(edges), np.array(edgeixes, dtype=np.int64), ee2ix)


def process_nuscenes_lanegraph(nmap, res_meters=1.0, eps=1e-6):
    """Discretize a NuScenesMap's lanes into the graph format.

    Requires nuscenes-devkit; mirrors reference
    ``nuscenes_utils.py:50-104`` (1m discretization, duplicate removal,
    connector stitching).
    """
    from nuscenes.map_expansion.arcline_path_utils import discretize_lane

    lane_pts = {}
    for lane in nmap.lane + nmap.lane_connector:
        my_lane = nmap.arcline_path_3.get(lane["token"], [])
        pts = np.array(discretize_lane(my_lane, res_meters))[:, :2]
        # drop consecutive duplicates (keep >= 2 pts invariant)
        d = np.linalg.norm(pts[1:] - pts[:-1], axis=1)
        keep = np.ones(len(pts), bool)
        keep[:-1] = d > eps
        lane_pts[lane["token"]] = pts[keep]

    for intok, conn in nmap.connectivity.items():
        for outtok in conn["outgoing"]:
            if outtok in lane_pts and intok in lane_pts:
                if np.linalg.norm(lane_pts[outtok][0] - lane_pts[intok][-1]) <= eps:
                    lane_pts[intok] = lane_pts[intok][:-1]

    xys = []
    start = {}
    for lid, pts in lane_pts.items():
        start[lid] = len(xys)
        xys.extend(pts.tolist())
    in_edges = [[] for _ in xys]
    out_edges = [[] for _ in xys]
    for lid, pts in lane_pts.items():
        s = start[lid]
        for ix in range(len(pts) - 1):
            out_edges[s + ix].append(s + ix + 1)
            in_edges[s + ix + 1].append(s + ix)
        for outtok in nmap.connectivity[lid]["outgoing"]:
            if outtok in lane_pts:
                out_edges[s + len(pts) - 1].append(start[outtok])
        for intok in nmap.connectivity[lid]["incoming"]:
            if intok in lane_pts:
                in_edges[s].append(start[intok] + len(lane_pts[intok]) - 1)

    edges, edgeixes, _ = _build_edges(xys, out_edges, eps)
    return {"xy": np.array(xys), "in_edges": in_edges,
            "out_edges": out_edges, "edges": edges, "edgeixes": edgeixes}


def flip_lanegraph_x(lg, map_height_m):
    """Flip about the x axis (Singapore right-hand-drive conversion,
    reference ``map_env.py:131-144``)."""
    lg = dict(lg)
    xy = lg["xy"].copy()
    xy[:, 1] = map_height_m - xy[:, 1]
    lg["xy"] = xy
    edges = lg["edges"].copy()
    edges[:, 1] = map_height_m - edges[:, 1]
    edges[:, 3] *= -1
    lg["edges"] = edges
    return lg


def synthetic_lanegraph(extent_m=128.0, spacing_m=32.0, res_m=2.0):
    """Grid of straight bidirectional-by-pairs lanes for tests/benchmarks.

    Horizontal lanes run +x at y = k*spacing; vertical lanes run +y at
    x = k*spacing. Each lane is an independent chain (no turns) — enough
    structure for lane matching, spline building, and BFS expansion.
    """
    xys = []
    out_edges = []
    in_edges = []

    def add_lane(points):
        s = len(xys)
        n = len(points)
        xys.extend(points)
        out_edges.extend([[] for _ in range(n)])
        in_edges.extend([[] for _ in range(n)])
        for i in range(n - 1):
            out_edges[s + i].append(s + i + 1)
            in_edges[s + i + 1].append(s + i)

    n_pts = int(extent_m / res_m) + 1
    ts = np.linspace(0, extent_m, n_pts)
    for k in np.arange(spacing_m, extent_m, spacing_m):
        add_lane([(t, k) for t in ts])            # +x lane
        add_lane([(extent_m - t, k - spacing_m / 4) for t in ts])  # -x lane
        add_lane([(k, t) for t in ts])            # +y lane
        add_lane([(k - spacing_m / 4, extent_m - t) for t in ts])  # -y lane

    edges, edgeixes, _ = _build_edges(np.array(xys), out_edges)
    return {"xy": np.array(xys), "in_edges": in_edges,
            "out_edges": out_edges, "edges": edges, "edgeixes": edgeixes}
