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


def test_parity_eval_cli(tmp_path):
    scene = os.path.join(REPO, "examples", "scene")
    if not os.path.exists(os.path.join(scene, "neumesh", "ckpts",
                                       "latest.ckpt")):
        subprocess.run([sys.executable, "tools/make_example_scene.py"],
                       cwd=REPO, env=CPU_ENV, check=True, timeout=600)
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
