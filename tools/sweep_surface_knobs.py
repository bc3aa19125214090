"""Sweep the round-3 surface-serving knobs on TPU.

Measures Mrays/s of the bench.py headline configuration across
(scan_candidates, tile_kp_per_probe, f32_layers, secant iters) variants.
    python tools/sweep_surface_knobs.py [--subdiv 7] [--n 65536]
"""
import argparse
import json
import os
import sys
import time

import jax

cache_dir = os.path.expanduser('~/.cache/neumesh_tpu_jax')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_sweep import build, rays  # noqa: E402
from neumesh_tpu.ops.rays import block_order_indices  # noqa: E402
from neumesh_tpu.render.ray_casting import surface_render  # noqa: E402


def bench_cfg(n, subdiv, secant=6, iters=10, sblk=512, max_cand=256,
              tile=128, bh=8, bw=16, steps=24, **model_kw):
    model, params = build(use_pallas=True, sblk=sblk, subdivisions=subdiv,
                          **model_kw)
    o, d = rays(n)
    side = int(n ** 0.5)
    perm, _ = block_order_indices(side, side, bh, bw)
    o, d = o[perm], d[perm]
    mg = model.mesh_grid

    @jax.jit
    def render(params, o, d, bufs):
        with mg.bound_buffers(bufs):
            c, dep, _ = surface_render(
                model, params, o, d, ray_tile=tile, scan_mode="distance",
                tile_max_candidates=max_cand,
                ray_casting_cfgs={"N_steps": steps,
                                  "N_secant_steps": secant})
        return c

    bufs = mg.device_buffers()
    render(params, o, d, bufs).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = render(params, o, d, bufs)
    out.block_until_ready()
    return n * iters / (time.perf_counter() - t0) / 1e6


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=7)
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--variants", default="base,scan128,kp12,combo,"
                                          "combo_f32heads")
    args = ap.parse_args()

    SERVING_R3 = {"tile_kp_per_probe": 12, "max_cand": 128, "sblk": 1024,
                  "secant": 4, "f32_layers": ("d0", "dh", "c0", "ch"),
                  "secant_full_precision": False}
    VARIANTS = {
        "base": {},
        "scan128": {"scan_candidates": 128},
        "scan96": {"scan_candidates": 96},
        "kp12": {"tile_kp_per_probe": 12},
        "kp16": {"tile_kp_per_probe": 16},
        "combo": {"scan_candidates": 128, "tile_kp_per_probe": 12},
        "combo_f32heads": {"scan_candidates": 128, "tile_kp_per_probe": 12,
                           "f32_layers": ("d0", "dh", "c0", "ch")},
        "combo_f32all": {"scan_candidates": 128, "tile_kp_per_probe": 12,
                         "f32_layers": ("density", "color")},
        "combo_mc128": {"tile_kp_per_probe": 12, "max_cand": 128},
        "combo_mc128_sblk1024": {"tile_kp_per_probe": 12, "max_cand": 128,
                                 "sblk": 1024},
        "combo_mc192": {"tile_kp_per_probe": 12, "max_cand": 192,
                        "scan_candidates": 128},
        "combo_mc128_f32heads": {"tile_kp_per_probe": 12, "max_cand": 128,
                                 "f32_layers": ("d0", "dh", "c0", "ch")},
        "combo_mc128_t256": {"tile_kp_per_probe": 12, "max_cand": 128,
                             "tile": 256, "bh": 16, "bw": 16},
        "fast": {"tile_kp_per_probe": 12, "max_cand": 128, "sblk": 1024,
                 "secant": 4},
        "fast6": {"tile_kp_per_probe": 12, "max_cand": 128, "sblk": 1024},
        "fast_f32heads": {"tile_kp_per_probe": 12, "max_cand": 128,
                          "sblk": 1024, "secant": 4,
                          "f32_layers": ("d0", "dh", "c0", "ch")},
        "fast_f32all": {"tile_kp_per_probe": 12, "max_cand": 128,
                        "sblk": 1024, "secant": 4,
                        "f32_layers": ("density", "color")},
        "serving_secbf16": {"tile_kp_per_probe": 12, "max_cand": 128,
                            "sblk": 1024, "secant": 4,
                            "f32_layers": ("d0", "dh", "c0", "ch"),
                            "secant_full_precision": False},
        "serving_steps16": {**SERVING_R3, "steps": 16},
        "serving_scanc64": {**SERVING_R3, "scan_candidates": 64},
        "serving_kp8": {**SERVING_R3, "tile_kp_per_probe": 8},
        "serving_all3": {**SERVING_R3, "steps": 16, "scan_candidates": 64,
                         "tile_kp_per_probe": 8},
        "serving_s16_kp8": {**SERVING_R3, "steps": 16,
                            "tile_kp_per_probe": 8},
        "serving_s16_sec3": {**SERVING_R3, "steps": 16, "secant": 3},
        "serving_s16_kp8_g4": {**SERVING_R3, "steps": 16,
                               "tile_kp_per_probe": 8,
                               "secant_tiles_per_program": 4},
        "serving_s16_kp8_g8": {**SERVING_R3, "steps": 16,
                               "tile_kp_per_probe": 8,
                               "secant_tiles_per_program": 8},
        "serving_s16_kp8_g16": {**SERVING_R3, "steps": 16,
                                "tile_kp_per_probe": 8,
                                "secant_tiles_per_program": 16},
        "serving_r3b": {**SERVING_R3, "steps": 16, "tile_kp_per_probe": 8},
        "serving_r3b_scank1": {**SERVING_R3, "steps": 16,
                               "tile_kp_per_probe": 8, "scan_knn_k": 1},
        "serving_r3b_scank4": {**SERVING_R3, "steps": 16,
                               "tile_kp_per_probe": 8, "scan_knn_k": 4},
        "serving_r3b_scanc64": {**SERVING_R3, "steps": 16,
                                "tile_kp_per_probe": 8,
                                "scan_candidates": 64},
        "serving_r3b_k1c64": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "scan_candidates": 64},
        "serving_r3b_k1c96": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "scan_candidates": 96},
        "serving_r3b_steps12": {**SERVING_R3, "steps": 12,
                                "tile_kp_per_probe": 8},
        "serving_r3b_k1c64_s12": {**SERVING_R3, "steps": 12,
                                  "tile_kp_per_probe": 8, "scan_knn_k": 1,
                                  "scan_candidates": 64},
        # r4 = the bench.py serving config after the re-bracket fold
        "serving_r4": {**SERVING_R3, "steps": 16, "tile_kp_per_probe": 8,
                       "scan_knn_k": 1},
        "serving_r4_fullg4": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "full_tiles_per_program": 4},
        "serving_r4_fullg8": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "full_tiles_per_program": 8},
        "serving_r4_fullg16": {**SERVING_R3, "steps": 16,
                               "tile_kp_per_probe": 8, "scan_knn_k": 1,
                               "full_tiles_per_program": 16},
        "serving_r4_sec3": {**SERVING_R3, "steps": 16,
                            "tile_kp_per_probe": 8, "scan_knn_k": 1,
                            "secant": 3},
        # r5 = r4 + sec3 (the serving config after the sec3 gate)
        "serving_r5": {**SERVING_R3, "steps": 16, "tile_kp_per_probe": 8,
                       "scan_knn_k": 1, "secant": 3},
        "serving_r5_c64": {**SERVING_R3, "steps": 16,
                           "tile_kp_per_probe": 8, "scan_knn_k": 1,
                           "secant": 3, "scan_candidates": 64},
        "serving_r5_c96": {**SERVING_R3, "steps": 16,
                           "tile_kp_per_probe": 8, "scan_knn_k": 1,
                           "secant": 3, "scan_candidates": 96},
        "serving_r5_cb32": {**SERVING_R3, "steps": 16,
                            "tile_kp_per_probe": 8, "scan_knn_k": 1,
                            "secant": 3, "tile_cell_budget": 32},
        "serving_r5_cb48": {**SERVING_R3, "steps": 16,
                            "tile_kp_per_probe": 8, "scan_knn_k": 1,
                            "secant": 3, "tile_cell_budget": 48},
        "serving_r5_cb24": {**SERVING_R3, "steps": 16,
                            "tile_kp_per_probe": 8, "scan_knn_k": 1,
                            "secant": 3, "tile_cell_budget": 24},
        # r6 = r5 + cb32 (the bench.py serving config)
        "serving_r6": {**SERVING_R3, "steps": 16, "tile_kp_per_probe": 8,
                       "scan_knn_k": 1, "secant": 3,
                       "tile_cell_budget": 32},
        # t256 measured 3.72 vs 3.28 Mrays/s but FAILS the quality gate
        # (surface GT -3.8 dB at 128 shared candidates over a 16x16
        # pixel patch on the 128px gate scene) — kept for measurement
        # only, NOT a serving config
        "serving_r6_t256": {**SERVING_R3, "steps": 16,
                            "tile_kp_per_probe": 8, "scan_knn_k": 1,
                            "secant": 3, "tile_cell_budget": 48,
                            "tile": 256, "bh": 16, "bw": 16},
        "serving_r6_kp12": {**SERVING_R3, "steps": 16, "scan_knn_k": 1,
                            "secant": 3, "tile_cell_budget": 32},
        "serving_r6_s12": {**SERVING_R3, "steps": 12,
                           "tile_kp_per_probe": 8, "scan_knn_k": 1,
                           "secant": 3, "tile_cell_budget": 32},
        "serving_r6_noRB4": {**SERVING_R3, "steps": 16,
                             "tile_kp_per_probe": 8, "scan_knn_k": 1,
                             "secant": 4, "tile_cell_budget": 32,
                             "secant_rebracket": False},
        "serving_r6_noRB3": {**SERVING_R3, "steps": 16,
                             "tile_kp_per_probe": 8, "scan_knn_k": 1,
                             "secant": 3, "tile_cell_budget": 32,
                             "secant_rebracket": False},
        "serving_r6_c96": {**SERVING_R3, "steps": 16,
                           "tile_kp_per_probe": 8, "scan_knn_k": 1,
                           "secant": 3, "tile_cell_budget": 32,
                           "scan_candidates": 96},
        "serving_r7_fullg4": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "secant": 3, "tile_cell_budget": 32,
                              "secant_tiles_per_program": 4,
                              "full_tiles_per_program": 4},
        "serving_r7_fullg8": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "secant": 3, "tile_cell_budget": 32,
                              "secant_tiles_per_program": 4,
                              "full_tiles_per_program": 8},
        "serving_r7": {**SERVING_R3, "steps": 16, "tile_kp_per_probe": 8,
                       "scan_knn_k": 1, "secant": 3,
                       "tile_cell_budget": 32,
                       "secant_tiles_per_program": 4},
        "serving_r6_frozen": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "secant": 3, "tile_cell_budget": 32,
                              "secant_frozen_knn": True},
        "serving_r6_secg2": {**SERVING_R3, "steps": 16,
                             "tile_kp_per_probe": 8, "scan_knn_k": 1,
                             "secant": 3, "tile_cell_budget": 32,
                             "secant_tiles_per_program": 2},
        "serving_r6_secg4": {**SERVING_R3, "steps": 16,
                             "tile_kp_per_probe": 8, "scan_knn_k": 1,
                             "secant": 3, "tile_cell_budget": 32,
                             "secant_tiles_per_program": 4},
        "serving_r6_secg8": {**SERVING_R3, "steps": 16,
                             "tile_kp_per_probe": 8, "scan_knn_k": 1,
                             "secant": 3, "tile_cell_budget": 32,
                             "secant_tiles_per_program": 8},
        "serving_r6_secg16": {**SERVING_R3, "steps": 16,
                              "tile_kp_per_probe": 8, "scan_knn_k": 1,
                              "secant": 3, "tile_cell_budget": 32,
                              "secant_tiles_per_program": 16},
        "serving_r6_secg8_frozen": {**SERVING_R3, "steps": 16,
                                    "tile_kp_per_probe": 8,
                                    "scan_knn_k": 1, "secant": 3,
                                    "tile_cell_budget": 32,
                                    "secant_tiles_per_program": 8,
                                    "secant_frozen_knn": True},
    }
    for name in args.variants.split(","):
        kw = VARIANTS[name]
        mr = bench_cfg(args.n, args.subdiv, **kw)
        print(json.dumps({"variant": name, "mrays": round(mr, 4),
                          **{k: str(v) for k, v in kw.items()}}),
              flush=True)
