"""Cluster semantic labels + scenario-type distribution plot (VERDICT r4
item 6; reference ``eval_adv_gen.py:45,170-233`` + the hand-written
``data/clustering/cluster_labels.txt``)."""

import importlib.util
import os

import numpy as np

_SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def _load_script(name):
    """Import scripts/<name>.py by explicit path.

    The reference tree (inserted at sys.path[0] by the ``reference_src``
    fixture of any golden-parity test that ran earlier in the session) also
    ships ``cluster_scenarios.py`` / ``eval_adv_gen.py``, so a bare
    ``import`` would silently resolve to the wrong module depending on test
    order.
    """
    key = f"_strive_scripts_{name}"
    spec = importlib.util.spec_from_file_location(
        key, os.path.join(_SCRIPTS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_semantic_cluster_names():
    semantic_cluster_name = _load_script("cluster_scenarios").semantic_cluster_name

    # feature = [angvec (planner->attacker dir), hvec (attacker heading)],
    # planner frame: +x forward, +y left
    cases = [
        ([1, 0, -1, 0], "Head On"),             # hit from front, oncoming
        ([-1, 0, 1, 0], "Behind"),              # rear-end, same direction
        ([0, 1, 1, 0], "Merge from Left"),      # left flank, same dir
        ([0, -1, 1, 0], "Merge from Right"),
        ([0, 1, 0, -1], "T-Bone Left"),         # left flank, crossing
        ([0, -1, 0, 1], "T-Bone Right"),
        ([1, 0.1, 1, 0], "Cutoff Left & Front"),  # front, same dir
        ([1, -0.3, 0, 1], "Front from Right"),  # front, crossing
    ]
    for feat, want in cases:
        got = semantic_cluster_name(np.asarray(feat, np.float64))
        assert got == want, f"{feat}: {got} != {want}"


def test_write_and_load_cluster_labels(tmp_path):
    write_cluster_labels = _load_script("cluster_scenarios").write_cluster_labels
    load_cluster_labels = _load_script("eval_adv_gen").load_cluster_labels

    class FakeKMeans:
        cluster_centers_ = np.asarray(
            [[1, 0, -1, 0], [-1, 0, 1, 0], [1, 0, -1, 0.01]])
        n_clusters = 3

    path, names = write_cluster_labels(FakeKMeans(), str(tmp_path))
    assert names[0] == "Head On" and names[1] == "Behind"
    assert names[2] == "Head On (2)"  # dedupe suffix
    loaded = load_cluster_labels(path, 3)
    assert loaded == names
    # wrong count fails loudly
    import pytest

    with pytest.raises(SystemExit):
        load_cluster_labels(path, 5)
    # no file -> generic names
    assert load_cluster_labels(None, 2) == ["cluster 0", "cluster 1"]


def test_plot_scenario_distrib(tmp_path):
    plot_scenario_distrib = _load_script("eval_adv_gen").plot_scenario_distrib

    out = os.path.join(str(tmp_path), "distrib.png")
    plot_scenario_distrib(
        3, ["Head On", "Behind", "T-Bone Left"],
        {"adv_sol_success": [0, 0, 2], "sol_failed": [1]}, out)
    assert os.path.isfile(out) and os.path.getsize(out) > 1000
