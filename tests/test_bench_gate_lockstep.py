"""bench.py's serving configs must match tools/quality_gate.py's
defaults: the bench line's quality claim IS the gate's verdict, so any
knob drift between the two silently un-certifies the headline
(VERDICT r3 #2). Both files are parsed statically — no TPU, no build.
"""
import ast
import os
import re

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _literal_dict_named(path, name):
    """Extract `NAME = dict(...)` / `NAME = {...}` literals from a file."""
    with open(path) as f:
        tree = ast.parse(f.read())
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign):
            continue
        if not any(isinstance(t, ast.Name) and t.id == name
                   for t in node.targets):
            continue
        v = node.value
        if isinstance(v, ast.Call) and isinstance(v.func, ast.Name) \
                and v.func.id == "dict":
            return {kw.arg: ast.literal_eval(kw.value)
                    for kw in v.keywords}
        return ast.literal_eval(v)
    raise AssertionError(f"{name} not found in {path}")


def _gate_defaults():
    """argparse defaults of tools/quality_gate.py, parsed statically."""
    with open(os.path.join(ROOT, "tools", "quality_gate.py")) as f:
        src = f.read()
    out = {}
    for m in re.finditer(
            r'add_argument\(\s*"--([\w-]+)"(.*?)\)', src, re.S):
        dm = re.search(r'default=([^,\)]+)', m.group(2))
        if dm:
            try:
                out[m.group(1).replace("-", "_")] = \
                    ast.literal_eval(dm.group(1).strip())
            except (ValueError, SyntaxError):
                pass
    return out


def test_volume_serving_config_matches_gate_defaults():
    vol = _literal_dict_named(os.path.join(ROOT, "bench.py"), "VOL")
    gate = _gate_defaults()
    assert vol["root_n_fine"] == gate["volume_n_fine"]
    assert vol["root_steps"] == gate["volume_root_steps"]
    assert vol["root_secant"] == gate["volume_root_secant"]
    assert vol["color_topk"] == gate["volume_topk"]
    # the STRUCTURAL flag, not just the numeric knobs (ADVICE r4): the
    # gate's default run must score the same sampling structure bench.py
    # times
    assert vol["root_anchored"] is bool(gate["volume_root_anchored"])
    assert vol.get("eval_candidates", 0) == gate["eval_candidates"]
    assert vol["root_win_frac"] == gate["volume_win_frac"]
    # tile-context structure is a quality knob too: the shared candidate
    # cache (rays per tile, ranked-candidate cap) changes the kNN set
    assert vol["ray_tile"] == gate["volume_tile"]
    assert vol["tile_max_candidates"] == gate["volume_max_candidates"]


def test_surface_serving_config_matches_gate_defaults():
    serving = _literal_dict_named(os.path.join(ROOT, "bench.py"),
                                  "SERVING")
    gate = _gate_defaults()
    assert serving["scan_knn_k"] == gate["scan_knn_k"]
    assert serving["tile_cell_budget"] == gate["tile_cell_budget"]
    assert serving["tile_kp_per_probe"] == gate["serving_kp"]
    assert serving["secant_tiles_per_program"] == \
        gate["secant_tiles_per_program"]
    # store_true flag: gate serving default is False unless passed
    assert serving["secant_full_precision"] is False
