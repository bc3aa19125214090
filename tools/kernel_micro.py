"""Microbenchmark field_fused in isolation with ablations."""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
cache_dir = os.path.expanduser('~/.cache/neumesh_tpu_jax')
jax.config.update('jax_compilation_cache_dir', cache_dir)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from neumesh_tpu.ops.pallas_kernels import field_fused

def weights(rng, n_dens, n_col, W, in_d, in_fg, in_col, dtype):
    def w(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.05,
                           dtype)
    def b(shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.01)
    dws = [w((in_d, W)), w((in_fg, W)), b((1, W))]
    for _ in range(n_dens - 1):
        dws += [w((W, W)), b((1, W))]
    dws += [w((W, 1)), b((1, 1))]
    cws = [w((in_col, W)), b((1, W))]
    for _ in range(n_col - 1):
        cws += [w((W, W)), b((1, W))]
    cws += [w((W, 3)), b((1, 3))]
    return tuple(dws), tuple(cws)

def run(name, B=1024, S=1024, C=128, want="density", md=8, mfg=2, mft=2,
        mv=4, gd=32, W=256, n_dens=3, n_col=4, sblk=512, k=8, iters=20,
        dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(size=(B, S, 3)).astype(np.float32) * 0.3)
    geo = np.zeros((B, 8, C), np.float32)
    geo[:, 0:3] = rng.normal(size=(B, 3, C)) * 0.3
    geo[:, 3:6] = rng.normal(size=(B, 3, C))
    geo[:, 6] = np.sum(geo[:, 0:3] ** 2, axis=1)
    geo[:, 7] = np.sum(geo[:, 0:3] * geo[:, 3:6], axis=1)
    geo = jnp.asarray(geo)
    F = gd if want != "full" else gd + 32
    feat = jnp.asarray(rng.normal(size=(B, C, F)).astype(np.float32))
    in_d = 1 + 2 * md
    in_fg = gd * (1 + 2 * mfg)
    in_col = 3 + in_d + 3 * (1 + 2 * mv) + 32 * (1 + 2 * mft)
    dws, cws = weights(rng, n_dens, n_col, W, in_d, in_fg, in_col,
                       dtype if dtype is not None else jnp.float32)
    dirs = jnp.asarray(rng.normal(size=(B, S, 3)).astype(np.float32))
    kw = dict(k=k, want=want, multires_d=md, multires_fg=mfg,
              multires_ft=mft, multires_view=mv, geometry_dim=gd,
              dtype=dtype, sample_block=sblk)

    # async-dispatch-proof timing: N kernel calls inside ONE jit with a
    # data-dependent carry (the tunnel's block_until_ready can return
    # before short queues execute); report the N=4 vs N=24 slope.
    import functools
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(xyz, n):
        def body(_, x):
            out = field_fused(x, geo, feat, 0.1, dws,
                              cws if want == "full" else None,
                              dirs if want == "full" else None, **kw)
            return x + out[0][..., None] * 1e-9
        return jax.lax.fori_loop(0, n, body, xyz)

    def t(n):
        chain(xyz, n).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            r = chain(xyz, n)
        r.block_until_ready()
        return (time.perf_counter() - t0) / 3

    dt = (t(24) - t(4)) / 20.0
    samples = B * S
    print(f"{name:34s} {dt*1e3:8.2f} ms  {samples/dt/1e6:8.1f} Msamp/s "
          f"({B}x{S} blk{sblk})", flush=True)

if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "base"):
        run("density baseline")
        run("density_nabla", want="density_nabla")
        run("full", want="full")
    if which in ("all", "abl"):
        run("density k=1", k=1)
        run("density md=0 mfg=0 (no emb)", md=0, mfg=0)
        run("density n_dens=1 (1 layer)", n_dens=1)
        run("density C=128->no selection W", C=128)
        run("density sblk=1024", sblk=1024)
        run("density sblk=256", sblk=256)
        run("density f32", dtype=None)
    if which == "act":
        # quantify the softplus100 activation cost: swap it for relu
        # (exp+log1p per hidden element vs one max)
        import neumesh_tpu.ops.pallas_kernels as pk
        run("density softplus (base)", sblk=1024)
        orig = pk._softplus100
        pk._softplus100 = lambda x: jnp.maximum(x, 0.0)
        run("density relu-act", sblk=1024)
        pk._softplus100 = orig
        run("density sblk=2048", sblk=2048)
        run("full sblk=1024", want="full", sblk=1024)
    if which == "secantshape":
        # the secant's per-eval shape: 65536 samples as 512 thin
        # (T=128) per-tile programs vs the same samples in fat blocks —
        # bounds the win from row-batching the secant kernel
        run("density 512x128 thin", B=512, S=128, sblk=1024)
        run("density 64x1024 fat", B=64, S=1024, sblk=1024)
        run("density 128x512 mid", B=128, S=512, sblk=1024)
        run("density 512x128 thin f32i", B=512, S=128, sblk=1024,
            dtype=None)
