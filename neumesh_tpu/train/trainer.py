"""Trainer: ray sampling + rendering + losses (reference models/trainer.py).

Functional design: ``Trainer.loss_fn`` is a pure function
(params, batch, key, teacher_params) -> (total_loss, (losses, extras)),
suitable for jax.value_and_grad inside one jitted train step. The reference's
DDP/DataParallel wrapping (models/trainer.py:39-42, train.py:326-332) is
replaced by sharding the ray batch over a device mesh (see parallel/).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import rays as rays_ops
from ..ops.metrics import psnr
from ..render.volume import volume_render_rays


def density_distill_loss(density_pred, density_gt, density_clip=None):
    """SDF distillation L1.

    ``density_clip=None`` (the default) is the reference's SHIPPED behavior:
    a plain unmasked L1 mean (reference models/trainer.py:214-216 — the
    masked ``DensityLoss`` at :13-23 is constructed at :48 but never
    called, so released checkpoints were trained with the plain mean).
    Passing a float restores the masked variant: L1 averaged over
    |teacher sdf| <= clip.
    """
    l1 = jnp.abs(density_gt - density_pred)
    if density_clip is None:
        return jnp.mean(l1)
    mask = jnp.abs(density_gt) <= density_clip
    return jnp.sum(jnp.where(mask, l1, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


class Trainer:
    def __init__(self, model, loss_weights: dict, teacher_model=None,
                 distill_density_clip=None, teacher_dtype=None):
        """distill_density_clip: None (default) = reference-shipped plain L1
        mean; a float (e.g. 0.1) opts into the masked DensityLoss variant
        (reference models/trainer.py:13-23, defined but never invoked).

        teacher_dtype: compute dtype for the no-grad distillation teacher
        evals (e.g. jnp.bfloat16 / "bfloat16"); the teacher targets are
        stop-gradient'ed and cast back to f32. None (default) keeps the
        teacher at the f32 matmul-precision context of the train step."""
        self.model = model
        self.loss_weights = loss_weights
        self.teacher_model = teacher_model
        self.distill_density_clip = distill_density_clip
        if isinstance(teacher_dtype, str):
            teacher_dtype = jnp.dtype(teacher_dtype)
        self.teacher_dtype = teacher_dtype

    # ------------------------------------------------------------------
    def render_and_loss(
        self,
        params,
        model_input: dict,
        ground_truth: dict,
        key,
        render_kwargs_train: dict,
        N_rays: int,
        H: int,
        W: int,
        teacher_params=None,
        ray_constraint=None,
    ):
        """The reference Trainer.forward (models/trainer.py:50-115).

        ray_constraint: optional sharding-constraint fn (parallel.ray_sharder)
        applied to the generated rays — GSPMD then shards the whole per-ray
        pipeline over the device mesh (replaces DDP/DataParallel,
        reference models/trainer.py:39-42, train.py:326-332).
        """
        k_rays, k_render = jax.random.split(key)
        intrinsics = model_input["intrinsics"]
        c2w = model_input["c2w"]
        rays_o, rays_d, select_inds = rays_ops.get_rays(
            c2w, intrinsics, H, W, N_rays=N_rays, key=k_rays)
        if ray_constraint is not None:
            rays_o = ray_constraint(rays_o)
            rays_d = ray_constraint(rays_d)

        use_distill_loss = (
            self.loss_weights["distill_density"] > 0
            or self.loss_weights["distill_color"] > 0)
        use_eikonal_loss = self.loss_weights["eikonal"] > 0
        use_mask = self.loss_weights["mask"] > 0
        use_indicator_reg = self.loss_weights["indicator_reg"] > 0

        extras = volume_render_rays(
            self.model, params, rays_o, rays_d, k_render,
            detailed_output=True,
            samples_output=use_distill_loss,
            calc_normal=use_eikonal_loss or render_kwargs_train.get(
                "calc_normal", False),
            **{k: v for k, v in render_kwargs_train.items()
               if k not in ("calc_normal", "rayschunk", "batched")})
        rgb = extras["rgb"]

        target_rgb = jnp.take_along_axis(
            ground_truth["rgb"], select_inds[..., None], axis=-2)
        target_mask = None
        if use_mask:
            target_mask = jnp.take_along_axis(
                model_input["object_mask"], select_inds, axis=-1)
        mask_ignore = None
        if "mask_ignore" in model_input:
            mask_ignore = jnp.take_along_axis(
                model_input["mask_ignore"], select_inds, axis=-1)

        ret = self.compute_loss(
            params, rgb, target_rgb, extras,
            mask=target_mask, mask_ignore=mask_ignore,
            use_distill_loss=use_distill_loss,
            use_eikonal_loss=use_eikonal_loss,
            use_indicator_reg=use_indicator_reg,
            teacher_params=teacher_params)
        ret["extras"]["select_inds"] = select_inds
        return ret

    # ------------------------------------------------------------------
    def compute_loss(
        self,
        params,
        rgb,
        target_rgb,
        extras: dict,
        mask=None,
        mask_ignore=None,
        use_eikonal_loss: bool = False,
        use_distill_loss: bool = False,
        use_indicator_reg: bool = False,
        teacher_params=None,
    ):
        """reference models/trainer.py:173-272; epsilon/clamp placement kept."""
        w = self.loss_weights
        losses = {}
        out_extras = dict(extras)

        if use_eikonal_loss:
            nablas = extras["implicit_nablas"]
            # safe norm: jnp.linalg.norm has a NaN gradient at exactly-zero
            # vectors (f32 underflow can produce them); torch's subgradient
            # is 0 there (reference models/trainer.py:190 relies on that)
            nablas_norm = jnp.sqrt(jnp.sum(nablas * nablas, axis=-1) + 1e-12)

        mask_volume = jnp.clip(extras["mask_volume"], 1e-3, 1 - 1e-3)
        out_extras["mask_volume_clipped"] = mask_volume

        loss_img = w["img"] * jnp.abs(rgb - target_rgb)  # per-ray L1

        if use_eikonal_loss:
            losses["loss_eikonal"] = w["eikonal"] * jnp.mean(
                (nablas_norm - 1.0) ** 2)

        if use_distill_loss:
            assert self.teacher_model is not None and teacher_params is not None
            if self.teacher_dtype is not None:
                from ..nn import mlp_compute_dtype
                with mlp_compute_dtype(self.teacher_dtype):
                    gt_sdf, gt_radiances = self.teacher_model.forward(
                        teacher_params, extras["xyz"], extras["dirs"])
                gt_sdf = gt_sdf.astype(jnp.float32)
                gt_radiances = gt_radiances.astype(jnp.float32)
            else:
                gt_sdf, gt_radiances = self.teacher_model.forward(
                    teacher_params, extras["xyz"], extras["dirs"])
            gt_sdf = jax.lax.stop_gradient(gt_sdf)
            gt_radiances = jax.lax.stop_gradient(gt_radiances)
            losses["loss_density"] = w["distill_density"] * density_distill_loss(
                extras["density"], gt_sdf[..., None],
                density_clip=self.distill_density_clip)
            losses["loss_color"] = w["distill_color"] * jnp.mean(
                (extras["colors"] - gt_radiances) ** 2)

        if use_indicator_reg:
            losses["loss_indicator_vector_reg"] = w["indicator_reg"] * jnp.mean(
                (params["indicator_vector"]
                 - self.model.mesh_grid.vertex_normals) ** 2)

        if mask is not None:
            target_mask = mask
            # BCE on clamped acc map (reference models/trainer.py:230-232)
            mv = mask_volume
            tm = target_mask.astype(jnp.float32)
            losses["loss_mask"] = w["mask"] * jnp.mean(
                -(tm * jnp.log(mv) + (1 - tm) * jnp.log(1 - mv)))
            if mask_ignore is not None:
                target_mask = jnp.logical_and(target_mask, mask_ignore)
            losses["loss_img"] = (
                jnp.sum(loss_img * target_mask[..., None])
                / (jnp.sum(target_mask) + 1e-10))
            out_extras["psnr"] = psnr(rgb, target_rgb,
                                      valid_mask=target_mask[..., None])
        else:
            if mask_ignore is not None:
                losses["loss_img"] = (
                    jnp.sum(loss_img * mask_ignore[..., None])
                    / (jnp.sum(mask_ignore) + 1e-10))
                out_extras["psnr"] = psnr(rgb, target_rgb,
                                          valid_mask=mask_ignore[..., None])
            else:
                losses["loss_img"] = jnp.mean(loss_img)
                out_extras["psnr"] = psnr(rgb, target_rgb)

        losses["total"] = sum(losses.values())
        if use_eikonal_loss:
            out_extras["implicit_nablas_norm"] = nablas_norm
        scalars = {"1/s": 1.0 / self.model.forward_s(params)}
        if use_indicator_reg and getattr(self.model, "learn_indicator_weight",
                                         False):
            scalars["indicator_weight"] = self.model.forward_indicator_weight(
                params)
        out_extras["scalars"] = scalars
        return {"losses": losses, "extras": out_extras}

    # ------------------------------------------------------------------
    def render_and_loss_painting(
        self,
        params,
        model_input: dict,
        ground_truth: dict,
        key,
        render_kwargs_train: dict,
        teacher_params=None,
    ):
        """Texture-painting objective (reference models/trainer.py:117-171):
        paint rays rendered with random view directions (view-independence),
        background rays with distillation; losses over the concatenation."""
        k_paint, k_bg = jax.random.split(key)

        def render_group(suffix, k, samples_output, random_direction):
            rays_o = model_input["rays_o_" + suffix][:, None, :]
            rays_d = model_input["rays_d_" + suffix][:, None, :]
            extras = volume_render_rays(
                self.model, params, rays_o, rays_d, k,
                detailed_output=True,
                samples_output=samples_output,
                random_color_direction=random_direction,
                **{k2: v for k2, v in render_kwargs_train.items()
                   if k2 not in ("calc_normal", "rayschunk", "batched")})
            target_rgb = ground_truth["rgb_" + suffix][:, None, :]
            mask = model_input["mask_" + suffix][:, None]
            return extras["rgb"], target_rgb, mask, extras

        rgb_p, tgt_p, mask_p, extras_p = render_group(
            "paint", k_paint, False, True)
        rgb_b, tgt_b, mask_b, extras_b = render_group(
            "bg", k_bg, True, False)

        rgb = jnp.concatenate([rgb_p, rgb_b], axis=0)
        target_rgb = jnp.concatenate([tgt_p, tgt_b], axis=0)
        mask = jnp.concatenate([mask_p, mask_b], axis=0)
        extras = dict(extras_b)
        extras["mask_volume"] = jnp.concatenate(
            [extras_b["mask_volume"], extras_p["mask_volume"]], axis=0)
        return self.compute_loss(
            params, rgb, target_rgb, extras, mask=mask,
            use_distill_loss=True, teacher_params=teacher_params)
