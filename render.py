"""Novel-view synthesis CLI (reference render.py).

Renders a spiral camera path from a checkpoint and writes per-view PNGs,
normal maps, and rgb/depth MP4s. Measures and prints throughput (Mrays/s).
"""
from __future__ import annotations

import os
import time

import imageio.v2 as imageio
import jax
import numpy as np

from neumesh_tpu.config import create_args_parser, load_config
from neumesh_tpu.dataio import get_data
from neumesh_tpu.models import build_framework
from neumesh_tpu.ops.cameras import c2w_track_spiral, normalize, poses_avg
from neumesh_tpu.utils.checkpoints import CheckpointIO, sorted_ckpts
from neumesh_tpu.utils.print_fn import log


def render_function(args, model, params, render_kwargs_test, render_fn):
    import jax.numpy as jnp
    from neumesh_tpu.ops.rays import get_rays

    if args.get("dataset_split", None) is not None:
        args.data.split = args.dataset_split
    if args.get("background", None) is not None:
        render_kwargs_test["white_bkgd"] = args.background == 1
    dataset = get_data(args, downscale=args.downscale)

    _, model_input, _ = dataset[0]
    intrinsics = np.array(model_input["intrinsics"])
    H, W = dataset.H, dataset.W
    # resolution overrides rescale the principal point/scale consistently
    # (reference render.py:115-127)
    if args.get("H", None) is not None:
        intrinsics[1, 2] *= args.H / dataset.H
        H = args.H
    if args.get("H_scale", None) is not None:
        H = int(dataset.H * args.H_scale)
        intrinsics[1, 2] *= H / dataset.H
    if args.get("W", None) is not None:
        intrinsics[0, 2] *= args.W / dataset.W
        W = args.W
    if args.get("W_scale", None) is not None:
        W = int(dataset.W * args.W_scale)
        intrinsics[0, 2] *= W / dataset.W
    log.info(f"=> Rendering resolution @ [{H} x {W}]")

    c2ws = np.stack(dataset.c2w_all, 0)

    # --camera_inds overrides the camera path (its help promises "instead
    # of the spiral path"), so check it before the default spiral branch
    if args.get("camera_inds", None):
        inds = [int(x) for x in str(args.camera_inds)
                .replace("~", ",").split(",") if x != ""]
        render_c2ws = [c2ws[i] for i in inds]
    elif args.camera_path == "spiral":
        if args.get("test_frame", None) is not None:
            test_pose = c2ws[args.test_frame]
            up = test_pose[:3, 1]
            focus_distance = np.linalg.norm(test_pose[:3, 3], axis=-1)
        else:
            test_pose = poses_avg(c2ws)
            focus_distance = np.mean(np.linalg.norm(c2ws[:, :3, 3], axis=-1))
            up = c2ws[:, :3, 1].sum(0)
        rads = np.array([
            np.percentile(np.abs(c2ws[:, 0, 3]), 10, 0),
            np.percentile(np.abs(c2ws[:, 1, 3]), 15, 0),
            np.percentile(np.abs(c2ws[:, 2, 3]), 30, 0),
        ]).reshape(-1)
        spiral_rad = args.get("spiral_rad", []) or []
        for i, r in enumerate(spiral_rad[:3]):
            if r >= 0:
                rads[i] = r
        render_c2ws = c2w_track_spiral(
            test_pose, normalize(up), rads, focus_distance * 0.8,
            zrate=0.0, rots=1, N=args.num_views)
    elif args.camera_path == "dataset":
        inds = [int(x) for x in str(args.camera_inds or
                                    "0").replace("~", ",").split(",")
                if x != ""]
        render_c2ws = [c2ws[i] for i in inds]
    else:
        raise RuntimeError(
            "Please choose render type between [spiral, dataset]")

    render_kwargs_test["rayschunk"] = args.rayschunk
    if args.get("ray_tile", None):
        render_kwargs_test["ray_tile"] = args.ray_tile
    outbase = args.get("outbase", None) or args.expname
    output_dir = os.path.join("out", outbase)
    if args.get("outdirectory", None) is not None:
        output_dir = os.path.join(output_dir, args.outdirectory)
    os.makedirs(output_dir, exist_ok=True)
    normal_dir = os.path.join(output_dir, "normal")
    os.makedirs(normal_dir, exist_ok=True)

    def integerify(img):
        return (np.clip(img, 0, 1) * 255.0).astype(np.uint8)

    rgb_imgs, depth_imgs, normal_imgs = [], [], []
    if hasattr(render_fn, "set_image_hw"):
        render_fn.set_image_hw(H, W)   # pixel-block tiling (surface mode)
    kwargs = {k: v for k, v in render_kwargs_test.items()
              if k not in ("batched",)}
    kwargs["calc_normal"] = True
    # inference: reuse up-sampling SDF evals (identical values; only the
    # calc_normal=False branch consumes it — harmless otherwise)
    kwargs["reuse_upsample_sdf"] = True
    total_rays = 0
    t_render = 0.0
    view_times = []
    key = jax.random.PRNGKey(0)
    intr_j = jnp.asarray(intrinsics)
    # reference render.py:201,256: --disable_rgb skips the per-view
    # render and every image/video write (the whole block is gated);
    # the camera path + output dirs above are still constructed
    if args.get("disable_rgb", False):
        log.info("=> --disable_rgb: skipping render + image/video writes")
        return 0.0
    for idx, c2w in enumerate(render_c2ws):
        rays_o, rays_d, _ = get_rays(
            jnp.asarray(np.asarray(c2w, np.float32)), intr_j, H, W)
        t0 = time.time()
        rgb, depth, extras = render_fn(
            params, rays_o, rays_d, key=key, detailed_output=False, **kwargs)
        rgb = np.asarray(jax.block_until_ready(rgb))
        view_times.append(time.time() - t0)
        t_render += view_times[-1]
        total_rays += H * W
        depth = np.asarray(depth).reshape(H, W, 1)
        depth = depth / max(depth.max(), 1e-9)
        rgb_imgs.append(rgb.reshape(H, W, 3))
        depth_imgs.append(depth)
        imageio.imwrite(
            os.path.join(output_dir, f"{outbase}_rgb_{idx:03d}.png"),
            integerify(rgb_imgs[-1]))
        if "normals_volume" in extras:
            normals = np.asarray(extras["normals_volume"]).reshape(H, W, 3)
            normal_imgs.append(normals / 2.0 + 0.5)
            imageio.imwrite(
                os.path.join(normal_dir, f"{outbase}_normal_{idx:03d}.png"),
                integerify(normal_imgs[-1]))
        if idx % 10 == 0:
            log.info(f"view {idx + 1}/{len(render_c2ws)}")

    mrays_s = total_rays / max(t_render, 1e-9) / 1e6
    log.info(f"=> Rendered {total_rays} rays in {t_render:.2f}s: "
             f"{mrays_s:.3f} Mrays/s (incl. compile)")
    if len(view_times) > 1:
        # the first view carries the jit compile; report steady state too
        steady = (total_rays - H * W) / max(sum(view_times[1:]), 1e-9) / 1e6
        log.info(f"=> Steady state (excl. first view): {steady:.3f} Mrays/s")
        mrays_s = steady

    post_fix = f"{H}x{W}_{args.num_views}_{args.camera_path}"

    def write_video(path, frames):
        try:
            imageio.mimwrite(path, frames, fps=args.fps, quality=10)
        except Exception:
            # no ffmpeg backend in this environment: fall back to GIF
            gif = os.path.splitext(path)[0] + ".gif"
            imageio.mimwrite(gif, frames,
                             duration=1000.0 / max(args.fps, 1))
            log.warning(f"mp4 backend unavailable; wrote {gif}")

    write_video(os.path.join(output_dir, f"{outbase}_rgb_{post_fix}.mp4"),
                [integerify(i) for i in rgb_imgs])
    write_video(os.path.join(output_dir, f"{outbase}_depth_{post_fix}.mp4"),
                [integerify(np.repeat(i, 3, axis=-1)) for i in depth_imgs])
    return mrays_s


def main_function(args):
    model, params, trainer, _, render_kwargs_test, render_fn = \
        build_framework(args, args.model.framework)

    if args.get("load_pt", None) is None:
        ckpts = sorted_ckpts(os.path.join(args.training.exp_dir, "ckpts"))
        assert ckpts, f"no checkpoints under {args.training.exp_dir}/ckpts"
        ckpt_file = ckpts[-1]
    else:
        ckpt_file = args.load_pt
    log.info("=> Use ckpt: " + str(ckpt_file))

    ckpt_io = CheckpointIO(os.path.dirname(str(ckpt_file)) or ".")
    loaded = ckpt_io.load_file(str(ckpt_file), model_template=None)
    state = loaded.get("model", loaded)
    if any("weight_v" in str(k) for k in state):
        from neumesh_tpu.utils.torch_ckpt import (
            neumesh_state_dict_to_params, neus_state_dict_to_params)
        if "geometry_features" in state:
            params = neumesh_state_dict_to_params(state, model)
        else:
            params = neus_state_dict_to_params(state, model)
    else:
        from neumesh_tpu.utils.checkpoints import restore_into
        params = restore_into(params, state)

    if args.get("render_mode", "volume") == "surface":
        render_fn = make_surface_render_fn(args, model)
    else:
        n_dev_req = args.get("volume_devices", 0) or 0
        n_dev = n_dev_req if n_dev_req > 0 else jax.local_device_count()
        if n_dev > 1:
            render_fn = make_volume_render_fn(args, model, n_dev)

    render_function(args, model, params, render_kwargs_test, render_fn)


def make_surface_render_fn(args, model):
    """Chunked, jitted surface-render callable with the volume renderer's
    interface (params, rays_o, rays_d, key=..., **kw) -> (rgb, depth,
    extras). The FAST mode: one secant-refined surface hit + one color
    query per ray (ray_casting.surface_render)."""
    import functools

    import jax
    import jax.numpy as jnp

    from neumesh_tpu.render.ray_casting import surface_render

    cfgs = {"N_steps": args.get("surface_steps", 128) or 128,
            "N_secant_steps": args.get("surface_secant_steps", 8) or 8,
            "fill_inf": False}
    tile = args.get("surface_ray_tile", 0) or 0
    scan_mode = args.get("surface_scan", "density") or "density"
    max_cand = args.get("surface_max_candidates", 0) or None
    shade_kw = dict(
        shade_composite=args.get("surface_shade_composite", 0) or 0,
        shade_topk=args.get("surface_shade_topk", 0) or 0,
        shade_win_frac=args.get("surface_shade_win_frac", 0.5) or 0.5)

    # multi-chip serving: shard_map the surface program over the ray axis
    # of every local device (the reference's nn.DataParallel(dim=1) ray
    # scatter, models/trainer.py:39-42). --surface_devices 1 forces
    # single-device; 0 (default) uses all local devices.
    n_dev_req = args.get("surface_devices", 0) or 0
    n_dev = n_dev_req if n_dev_req > 0 else jax.local_device_count()
    dev_mesh = None
    if n_dev > 1:
        from neumesh_tpu.parallel.mesh import get_device_mesh
        dev_mesh = get_device_mesh(n_dev)
        log.info(f"=> Surface mode on {n_dev} devices (shard_map)")

    @functools.lru_cache(maxsize=8)
    def _jitted(chunk, tile_eff):
        def f(params, ro, rd):
            from neumesh_tpu.parallel.mesh import sharded_surface_render
            return sharded_surface_render(
                model, params, ro, rd, mesh=dev_mesh, calc_normal=True,
                ray_tile=tile_eff, scan_mode=scan_mode,
                tile_max_candidates=max_cand, **shade_kw,
                ray_casting_cfgs=dict(cfgs))
        return jax.jit(f)

    image_hw = [None, None]

    def render_fn(params, rays_o, rays_d, key=None, detailed_output=False,
                  **kw):
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        n = ro.shape[0]

        # tile-shared candidate caches need COMPACT ray bundles: permute
        # full-image rays into pixel blocks (1-D scanline tiles span a
        # whole image row and overflow the shared candidate cache).
        # If no feasible pixel block divides H/W, DISABLE tiling for this
        # render rather than silently binding scanline tiles (~13 dB loss
        # on full images — ADVICE r2).
        inv = None
        tile_eff = tile
        H, W = image_hw
        if tile > 1 and H and W and H * W == n:
            from neumesh_tpu.ops.rays import block_order_indices
            bh = max(1, int(np.sqrt(tile // 2)))
            bw = tile // bh
            while bh > 1 and (H % bh or W % bw):
                bh //= 2
                bw = tile // bh
            if H % bh == 0 and W % bw == 0:
                perm, inv = block_order_indices(H, W, bh, bw)
                ro, rd = ro[perm], rd[perm]
            else:
                log.warning(
                    f"surface_ray_tile={tile}: no pixel block divides "
                    f"{H}x{W}; disabling ray tiling for this render "
                    "(scanline tiles degrade tile-shared caches)")
                tile_eff = 0
        elif tile > 1:
            log.warning(
                f"surface_ray_tile={tile}: ray batch is not a full image "
                "(H*W != n); disabling ray tiling for this render")
            tile_eff = 0

        # chunks must split evenly over devices, and each device shard
        # evenly into tiles
        quantum = max(1, n_dev) * max(tile_eff, 1)
        chunk = args.rayschunk or n
        chunk = ((chunk + quantum - 1) // quantum) * quantum
        pad = (-n) % chunk
        if pad:
            ro = jnp.pad(ro, ((0, pad), (0, 0)), mode="edge")
            rd = jnp.pad(rd, ((0, pad), (0, 0)), mode="edge")
        fn = _jitted(chunk, tile_eff)
        outs = [fn(params, ro[i:i + chunk], rd[i:i + chunk])
                for i in range(0, n + pad, chunk)]
        rgb = jnp.concatenate([o[0] for o in outs])[:n]
        depth = jnp.concatenate([o[1] for o in outs])[:n]
        normals = jnp.concatenate(
            [o[2]["normals_surface"] for o in outs])[:n]
        mask = jnp.concatenate(
            [o[2]["mask_surface"] for o in outs])[:n]
        if inv is not None:
            rgb, depth, normals, mask = (rgb[inv], depth[inv],
                                         normals[inv], mask[inv])
        extras = {
            # the image loop writes "normals_volume"; surface normals are
            # the same quantity for this mode
            "normals_volume": normals,
            "mask_surface": mask,
        }
        return rgb, depth, extras

    render_fn.set_image_hw = lambda h, w: image_hw.__setitem__(
        slice(None), [h, w])
    return render_fn


def make_volume_render_fn(args, model, n_dev):
    """Chunked, jitted MULTI-DEVICE volume-render callable with the
    SingleRenderer interface: shard_map over the ray axis of every local
    device (parallel/mesh.py::sharded_volume_render — the reference
    scatters any render over devices via nn.DataParallel(dim=1),
    models/trainer.py:39-42; VERDICT r4 #2)."""
    import functools

    import jax
    import jax.numpy as jnp

    from neumesh_tpu.parallel.mesh import (get_device_mesh,
                                           sharded_volume_render)

    dev_mesh = get_device_mesh(n_dev)
    mg = getattr(model, "mesh_grid", None)
    log.info(f"=> Volume mode on {n_dev} devices (shard_map)")

    @functools.lru_cache(maxsize=8)
    def _jitted(static):
        sd = dict(static)

        def f(params, ro, rd, key, mesh_bufs):
            if mg is not None and mesh_bufs is not None:
                with mg.bound_buffers(mesh_bufs):
                    return sharded_volume_render(
                        model, params, ro, rd, key, mesh=dev_mesh, **sd)
            return sharded_volume_render(
                model, params, ro, rd, key, mesh=dev_mesh, **sd)
        return jax.jit(f)

    def render_fn(params, rays_o, rays_d, key=None, **kw):
        kw.pop("batched", None)
        rayschunk = kw.pop("rayschunk", 0)
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        n = ro.shape[0]
        tile = int(kw.get("ray_tile", 0) or 0)
        # chunks must split evenly over devices, and each device shard
        # evenly into tiles
        quantum = n_dev * max(tile, 1)
        chunk = rayschunk or n
        chunk = ((chunk + quantum - 1) // quantum) * quantum
        pad = (-n) % chunk
        if pad:
            ro = jnp.pad(ro, ((0, pad), (0, 0)), mode="edge")
            rd = jnp.pad(rd, ((0, pad), (0, 0)), mode="edge")
        static = tuple(sorted(
            (k, v) for k, v in kw.items()
            if isinstance(v, (bool, int, float, str, type(None)))))
        fn = _jitted(static)
        bufs = mg.device_buffers() if mg is not None else None
        if key is None:
            key = jax.random.PRNGKey(0)
        outs = [fn(params, ro[i:i + chunk], rd[i:i + chunk], key, bufs)
                for i in range(0, n + pad, chunk)]
        ret = {k: jnp.concatenate([o[k] for o in outs])[:n]
               for k in outs[0]}
        return ret["rgb"], ret["depth_volume"], ret

    return render_fn


def create_render_args(parser):
    parser.add_argument("--num_views", type=int, default=90)
    parser.add_argument("--downscale", type=float, default=1)
    parser.add_argument("--rayschunk", type=int, default=4096)
    parser.add_argument(
        "--ray_tile", type=int, default=0,
        help="volume mode: share one candidate cache across this many "
             "consecutive rays (coherent camera rays; bench.py uses 16)")
    parser.add_argument("--camera_path", type=str, default="spiral")
    parser.add_argument("--load_pt", type=str, default=None)
    parser.add_argument("--H", type=int, default=None)
    parser.add_argument("--H_scale", type=float, default=None)
    parser.add_argument("--W", type=int, default=None)
    parser.add_argument("--W_scale", type=float, default=None)
    parser.add_argument("--fps", type=int, default=30)
    parser.add_argument("--outbase", type=str, default=None)
    parser.add_argument("--outdirectory", type=str, default=None)
    parser.add_argument("--background", type=int, default=None)
    parser.add_argument("--test_frame", type=int, default=None)
    parser.add_argument("--spiral_rad", type=float, nargs="+", default=[])
    parser.add_argument("--dataset_split", default="entire", type=str)
    parser.add_argument("--disable_rgb", action="store_true")
    parser.add_argument(
        "--render_mode", type=str, default="volume",
        choices=["volume", "surface"],
        help="volume: full NeuS volume rendering (quality); surface: "
             "root-finding surface hit + one color query per ray (fast)")
    parser.add_argument(
        "--surface_steps", type=int, default=128,
        help="surface mode: sign-change scan steps over the mesh-bounded "
             "interval")
    parser.add_argument(
        "--surface_secant_steps", type=int, default=8,
        help="surface mode: secant refinement iterations")
    parser.add_argument(
        "--surface_ray_tile", type=int, default=0,
        help="surface mode: share one candidate cache across this many "
             "consecutive rays (coherent camera rays; the bench.py "
             "throughput configuration uses 128)")
    parser.add_argument(
        "--surface_devices", type=int, default=0,
        help="surface mode: number of local devices to shard the render "
             "over (0 = all local devices; shard_map over the ray axis)")
    parser.add_argument(
        "--volume_devices", type=int, default=0,
        help="volume mode: number of local devices to shard the render "
             "over (0 = all local devices; 1 forces the single-device "
             "SingleRenderer path; shard_map over the ray axis)")
    parser.add_argument(
        "--surface_scan", type=str, default="density",
        choices=["density", "distance"],
        help="surface mode: field for the sign-change scan; 'distance' "
             "scans the interpolated mesh distance and refines on the "
             "density (the fast configuration)")
    parser.add_argument(
        "--surface_max_candidates", type=int, default=0,
        help="surface mode: ranked tile-context candidate cap "
             "(0 = uncapped; the bench.py configuration uses 128)")
    parser.add_argument(
        "--surface_shade_composite", type=int, default=0,
        help="surface mode: micro-composite shading — alpha-composite "
             "this many root-anchored sample depths instead of one "
             "color query at the root (0 = point shade). Recovers the "
             "integrated color on multi-crossing geometry "
             "(tools/quality_gate.py gates it on the torus scene)")
    parser.add_argument(
        "--surface_shade_topk", type=int, default=0,
        help="surface mode: color_topk of the micro-composite "
             "(0 = color at every midpoint)")
    parser.add_argument(
        "--surface_shade_win_frac", type=float, default=0.5,
        help="surface mode: win_frac of the micro-composite depths")
    parser.add_argument(
        "--camera_inds", type=str, default=None,
        help="comma-separated dataset view indices to render instead of the "
             "spiral path (e.g. '0,5,10')")
    return parser


if __name__ == "__main__":
    parser = create_args_parser()
    parser = create_render_args(parser)
    args, unknown = parser.parse_known_args()
    config = load_config(args, unknown)
    main_function(config)
