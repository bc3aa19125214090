"""tools/parity_eval.py must run end-to-end: render val_names views from a
checkpoint, score vs GT, and emit the reference-parity table (BASELINE.md
measurement plan; reference README.md:32's val splits)."""
import json
import os
import shutil
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CPU_ENV = {**os.environ,
           "JAX_PLATFORMS": "cpu", "JAX_PLATFORM_NAME": "cpu"}


def _ensure_example_scene():
    scene = os.path.join(REPO, "examples", "scene")
    if not os.path.exists(os.path.join(scene, "neumesh", "ckpts",
                                       "latest.ckpt")):
        subprocess.run([sys.executable, "tools/make_example_scene.py"],
                       cwd=REPO, env=CPU_ENV, check=True, timeout=600)
    return scene


def test_parity_eval_cli(tmp_path):
    scene = _ensure_example_scene()
    val = tmp_path / "val_names.txt"
    val.write_text("000000.png\n")
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    shutil.copy(os.path.join(scene, "data", "image", "000000.png"),
                ref_dir / "000000.png")
    out = tmp_path / "parity.json"
    proc = subprocess.run(
        [sys.executable, "tools/parity_eval.py",
         "--config", "examples/scene/neumesh/config.yaml",
         "--load_pt", "examples/scene/neumesh/ckpts/latest.ckpt",
         "--val_names", str(val), "--ref_renders", str(ref_dir),
         "--rayschunk", "2048", "--out_json", str(out)],
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    table = json.loads(out.read_text())
    assert table["ours_vs_gt"]["views"]
    assert table["parity"]["views"][0]["name"] == "000000"


def test_released_checkpoint_parity_rehearsal(tmp_path):
    """The DTU-day pipeline end-to-end (VERDICT r2 #5): fabricate a
    'released' reference-format .pt from a trained model
    (save_torch_checkpoint), render 'reference renders' with the f32
    volume path (eval.py --save_renders), then run tools/parity_eval.py
    loading THE .pt against those renders — converter + eval + parity
    table exactly as with the real released checkpoints
    (reference README.md:32,54). Same weights on both sides, so the gate
    must pass with |mean delta| ~ png-quantisation."""
    _ensure_example_scene()

    # 1. fabricate the "released" torch checkpoint from the native ckpt
    fab = tmp_path / "released_flagship.pt"
    code = f"""
import sys; sys.path.insert(0, {REPO!r})
import jax
jax.config.update("jax_platforms", "cpu")
from neumesh_tpu.config import load_yaml
from neumesh_tpu.models import build_framework
from neumesh_tpu.utils.checkpoints import CheckpointIO, restore_into
from neumesh_tpu.utils.torch_ckpt import save_torch_checkpoint
args = load_yaml({os.path.join(REPO, 'examples/scene/neumesh/config.yaml')!r})
model, params, *_ = build_framework(args, args.model.framework)
io = CheckpointIO({os.path.join(REPO, 'examples/scene/neumesh/ckpts')!r})
loaded = io.load_file({os.path.join(REPO, 'examples/scene/neumesh/ckpts/latest.ckpt')!r})
params = restore_into(params, loaded.get("model", loaded))
save_torch_checkpoint({str(fab)!r}, params, model, global_step=123)
print("saved", {str(fab)!r})
"""
    proc = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                          env=CPU_ENV, capture_output=True, text=True,
                          timeout=560)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]

    # 2. "reference renders" from the f32 volume path (native ckpt)
    ref_dir = tmp_path / "ref_renders"
    val = tmp_path / "val_names.txt"
    val.write_text("000000.png\n")
    proc = subprocess.run(
        [sys.executable, "eval.py",
         "--config", "examples/scene/neumesh/config.yaml",
         "--load_pt", "examples/scene/neumesh/ckpts/latest.ckpt",
         "--val_names", str(val), "--rayschunk", "2048",
         "--save_renders", str(ref_dir)],
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert (ref_dir / "000000.png").exists()

    # 3. parity eval loading the fabricated RELEASED .pt vs those renders
    out = tmp_path / "parity.json"
    proc = subprocess.run(
        [sys.executable, "tools/parity_eval.py",
         "--config", "examples/scene/neumesh/config.yaml",
         "--load_pt", str(fab),
         "--val_names", str(val), "--ref_renders", str(ref_dir),
         "--rayschunk", "2048", "--out_json", str(out)],
        cwd=REPO, env=CPU_ENV, capture_output=True, text=True, timeout=560)
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    table = json.loads(out.read_text())
    parity = table["parity"]
    assert parity["views"], "no parity rows produced"
    # identical weights through the .pt round-trip: deltas are pure
    # png-quantisation noise (observed ~0.06 dB on the example scene),
    # inside the ±0.1 dB gate
    assert parity["within_0p1_db"] is True, parity
    assert abs(parity["mean_delta_db"]) < 0.1, parity
