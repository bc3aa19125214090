"""Committed quality-gate artifacts must certify the benched serving
configuration on BOTH gate scenes (VERDICT r4 #1/#6): the convex sphere
AND the non-convex multi-crossing torus+offset-sphere scene where the
single-root assumption of the serving shortcuts can actually fail.
Artifacts live in GATES_r05/ and are produced by tools/quality_gate.py /
tools/editing_gate.py on the trained gate scenes (TPU)."""
import json
import os

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATES = os.path.join(ROOT, "GATES_r05")


def _load(name):
    path = os.path.join(GATES, name)
    assert os.path.exists(path), (
        f"missing committed gate artifact {path} — run "
        "tools/quality_gate.py on the scene and copy the JSON in")
    with open(path) as f:
        return json.load(f)


@pytest.mark.parametrize("scene", ["sphere", "torus"])
def test_quality_gate_passes_on_scene(scene):
    g = _load(f"quality_gate_{scene}.json")
    assert g["gate_volume"] is True, g
    assert g["gate_bf16"] is True, g
    assert g["gate_surface"] is True, g


@pytest.mark.parametrize("scene", ["sphere", "torus"])
def test_quality_gate_artifact_certifies_bench_config(scene):
    """The artifact's knobs must equal bench.py's serving dicts — the
    gate verdict certifies THE benched program, not a cousin."""
    from tests.test_bench_gate_lockstep import _literal_dict_named

    g = _load(f"quality_gate_{scene}.json")
    vol = _literal_dict_named(os.path.join(ROOT, "bench.py"), "VOL")
    serving = _literal_dict_named(os.path.join(ROOT, "bench.py"),
                                  "SERVING")
    assert g["volume_root_anchored"] == vol["root_anchored"]
    assert g["volume_n_fine"] == vol["root_n_fine"]
    assert g["volume_root_steps"] == vol["root_steps"]
    assert g["volume_root_secant"] == vol["root_secant"]
    assert g["volume_topk"] == vol["color_topk"]
    assert g["volume_win_frac"] == vol["root_win_frac"]
    assert g["volume_tile"] == vol["ray_tile"]
    assert g["volume_max_candidates"] == vol["tile_max_candidates"]
    assert g["serving_kp"] == serving["tile_kp_per_probe"]
    assert g["scan_knn_k"] == serving["scan_knn_k"]
    assert g["tile_cell_budget"] == serving["tile_cell_budget"]


def test_editing_gate_artifact_passes():
    g = _load("editing_gate_sphere.json")
    assert g["gate_edit_untouched"] is True, g
    assert g["gate_edit_swapped"] is True, g
    # region-wise PSNR sanity (VERDICT r4 #8): edits leak < 0.1 dB into
    # the untouched region while genuinely changing the swapped region
    assert g["untouched_delta_db"] < 0.1
    assert g["swapped_mean_abs_diff"] > 0.01
