"""Microbenchmark secant_refine in isolation.

The fused secant is the serving frame's biggest kernel (7 ms of 22 ms
at the r6 config). Ablate: n_iters slope (per-eval cost), rebracket,
frozen-knn selection, tile grouping — async-dispatch-proof via an
N-call jitted chain with a data-dependent carry (verify skill: TPU
tunnel timings of single short queues are unreliable).
    python tools/secant_micro.py
"""
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

cache_dir = os.path.expanduser('~/.cache/neumesh_tpu_jax')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neumesh_tpu.ops.pallas_kernels import secant_refine  # noqa: E402
from tools.kernel_micro import weights  # noqa: E402


def run(name, B=512, T=128, C=128, n_iters=3, rebracket=True,
        frozen=False, group=1, md=8, mfg=2, gd=32, W=256, n_dens=3,
        dtype=jnp.bfloat16, chain_lens=(4, 28)):
    rng = np.random.default_rng(0)
    R = B * T
    rays_o = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32) * 0.1
                         + np.array([0, 0, -2.5], np.float32))
    rays_d = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32) * 0.05
                         + np.array([0, 0, 1.0], np.float32))
    d_low = jnp.asarray(2.55 + rng.normal(size=R).astype(np.float32) * .01)
    d_high = d_low - 0.1
    f_low = jnp.asarray(-np.abs(rng.normal(size=R)).astype(np.float32))
    f_high = jnp.asarray(np.abs(rng.normal(size=R)).astype(np.float32))
    geo = np.zeros((B, 8, C), np.float32)
    geo[:, 0:3] = rng.normal(size=(B, 3, C)) * 0.3
    geo[:, 3:6] = rng.normal(size=(B, 3, C))
    geo[:, 6] = np.sum(geo[:, 0:3] ** 2, axis=1)
    geo[:, 7] = np.sum(geo[:, 0:3] * geo[:, 3:6], axis=1)
    geo = jnp.asarray(geo)
    feat = jnp.asarray(rng.normal(size=(B, C, gd)).astype(np.float32))
    in_d = 1 + 2 * md
    in_fg = gd * (1 + 2 * mfg)
    dws, _ = weights(rng, n_dens, 1, W, in_d, in_fg, 16,
                     dtype if dtype is not None else jnp.float32)
    kw = dict(n_iters=n_iters, k=8, multires_d=md, multires_fg=mfg,
              geometry_dim=gd, dtype=dtype, tile=T, logit_tau=0.0,
              group=group, frozen_knn=frozen)
    if rebracket:
        kw_dyn = dict(d_low_w=d_low + 0.05, d_high_w=d_high - 0.05)
    else:
        kw_dyn = {}

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(dl, n):
        def body(_, dl):
            out = secant_refine(rays_o, rays_d, dl, d_high, f_low,
                                f_high, geo, feat, 0.1, dws, **kw,
                                **kw_dyn)
            return dl + out * 1e-9
        return jax.lax.fori_loop(0, n, body, dl)

    ts = {}
    for n in chain_lens:
        chain(d_low, n).block_until_ready()
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            chain(d_low, n).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        ts[n] = best
    n0, n1 = chain_lens
    per_call = (ts[n1] - ts[n0]) / (n1 - n0)
    print(f"{name:28s} {per_call*1e3:7.3f} ms/call "
          f"({per_call/B*1e6:6.2f} us/program, "
          f"{R/per_call/1e6:7.1f} Mrays/s-equiv)", flush=True)
    return per_call


if __name__ == "__main__":
    run("r6 (3it+rb)", n_iters=3, rebracket=True)
    run("no rebracket 3it", n_iters=3, rebracket=False)
    run("no rebracket 1it", n_iters=1, rebracket=False)
    run("no rebracket 0it", n_iters=0, rebracket=False)
    run("frozen 3it+rb", n_iters=3, rebracket=True, frozen=True)
    run("group4 3it+rb", n_iters=3, rebracket=True, group=4)
    run("group8 3it+rb", n_iters=3, rebracket=True, group=8)
    run("group16 3it+rb", n_iters=3, rebracket=True, group=16)
    run("group8 frozen 3it+rb", n_iters=3, rebracket=True, group=8,
        frozen=True)
    run("f32 3it+rb", n_iters=3, rebracket=True, dtype=None)
