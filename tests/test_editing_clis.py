"""The four editing CLIs must run end-to-end from the checked-in example
configs (configs/editing/*.json) — the parity surface of the reference's
editing entry points (reference editing/render_texture_swapping.py,
render_texture_filling.py, render_geometry_editing.py, paint.py driven by
configs/{texture_swapping,texture_filling,geometry_editing,paint}/*.json).

Each CLI runs as a subprocess from the repo root on the synthetic example
scene (built once by tools/make_example_scene.py)."""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CPU_ENV = {**os.environ,
           "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"}


@pytest.fixture(scope="module")
def example_scene():
    scene = os.path.join(REPO, "examples", "scene")
    if not os.path.exists(os.path.join(scene, "neumesh", "ckpts",
                                       "latest.ckpt")):
        subprocess.run(
            [sys.executable, "tools/make_example_scene.py"],
            cwd=REPO, env=CPU_ENV, check=True, timeout=600)
    return scene


def _run(cmd, timeout=560):
    proc = subprocess.run(
        cmd, cwd=REPO, env=CPU_ENV, capture_output=True, text=True,
        timeout=timeout)
    assert proc.returncode == 0, (
        f"{' '.join(cmd)} failed:\n{proc.stdout[-2000:]}\n"
        f"{proc.stderr[-2000:]}")
    return proc


RENDER_ARGS = ["--camera_inds", "0", "--W", "20", "--H", "20",
               "--num_views", "1", "--rayschunk", "2048"]


@pytest.mark.parametrize("cli,config", [
    ("editing/render_texture_swapping.py",
     "configs/editing/texture_swapping_sphere.json"),
    ("editing/render_texture_filling.py",
     "configs/editing/texture_filling_sphere.json"),
    ("editing/render_geometry_editing.py",
     "configs/editing/geometry_editing_sphere.json"),
])
def test_render_cli(example_scene, tmp_path, cli, config):
    _run([sys.executable, cli, "--config", config,
          *RENDER_ARGS, "--outdirectory", str(tmp_path), "--outbase", "t"])
    outs = [f for f in os.listdir(tmp_path) if "rgb" in f]
    assert outs, f"{cli} produced no rgb output in {tmp_path}"


def test_editing_gate_smoke(example_scene, tmp_path):
    """tools/editing_gate.py (VERDICT r4 #8) runs the full swap flow +
    region-scored render end-to-end; on the barely-trained example scene
    only the no-leak gate is meaningful (color codes are near-uniform, so
    the swapped region barely changes — the swapped-differs gate is pinned
    on the TPU-trained artifact in test_gate_artifacts.py)."""
    out = tmp_path / "editing_gate.json"
    _run([sys.executable, "tools/editing_gate.py",
          "--config", "examples/scene/neumesh/config.yaml",
          "--out", str(out)], timeout=900)
    g = json.loads(out.read_text())
    assert g["gate_edit_untouched"] is True, g
    assert g["swapped_edit_vs_orig_db"] < 60.0  # the blend path executed


def test_paint_cli(example_scene, tmp_path):
    # a short-iteration copy of the checked-in paint config
    with open(os.path.join(REPO, "configs/editing/paint_sphere.json")) as f:
        cfg = json.load(f)
    cfg["num_iters"] = 2
    cfg["paint_name"] = "smoke"
    p = tmp_path / "paint_smoke.json"
    p.write_text(json.dumps(cfg))
    proc = _run([sys.executable, "editing/paint.py", "--config", str(p)])
    assert "Painting done" in proc.stdout + proc.stderr
