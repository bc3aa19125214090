"""Trainer loss-semantics pins (reference models/trainer.py).

The critical pin (VERDICT r3 #4): the reference's SHIPPED distillation
density loss is a plain unmasked L1 mean (models/trainer.py:214-216) — the
masked ``DensityLoss`` (:13-23) is constructed (:48) but never called.
Released checkpoints were therefore trained with the plain mean, and our
default must match it for training parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neumesh_tpu.train.trainer import Trainer, density_distill_loss


def test_density_distill_default_is_plain_l1_mean(rng):
    pred = jnp.asarray(rng.normal(size=(4, 7, 1)), jnp.float32)
    gt = jnp.asarray(rng.normal(size=(4, 7, 1)), jnp.float32)
    got = density_distill_loss(pred, gt)
    want = float(jnp.mean(jnp.abs(gt - pred)))
    assert got == pytest.approx(want, rel=1e-6)


def test_density_distill_masked_variant(rng):
    pred = jnp.asarray(rng.normal(size=(64,)), jnp.float32)
    gt = jnp.asarray(rng.normal(scale=0.2, size=(64,)), jnp.float32)
    clip = 0.1
    got = density_distill_loss(pred, gt, density_clip=clip)
    m = np.abs(np.asarray(gt)) <= clip
    assert m.any() and not m.all()  # exercise both branches of the mask
    want = float(np.abs(np.asarray(gt) - np.asarray(pred))[m].mean())
    assert got == pytest.approx(want, rel=1e-5)


class _StubTeacher:
    """Minimal teacher exposing the model protocol used by compute_loss."""

    def forward(self, params, xyz, dirs):
        sdf = xyz.sum(-1)  # any deterministic function of position
        rgb = jnp.stack([dirs[..., 0]] * 3, axis=-1) * 0.5 + 0.5
        return sdf, rgb


class _StubModel:
    def forward_s(self, params):
        return jnp.float32(64.0)


def _fabricated_extras(rng, R=8, S=16):
    return {
        "mask_volume": jnp.asarray(rng.uniform(size=(R,)), jnp.float32),
        "xyz": jnp.asarray(rng.normal(size=(R, S, 3)), jnp.float32),
        "dirs": jnp.asarray(rng.normal(size=(R, S, 3)), jnp.float32),
        "density": jnp.asarray(rng.normal(size=(R, S, 1)), jnp.float32),
        "colors": jnp.asarray(rng.uniform(size=(R, S, 3)), jnp.float32),
    }


def test_compute_loss_distill_matches_reference_semantics(rng):
    """Full compute_loss parity vs hand-computed reference math
    (models/trainer.py:200-219): img L1 mean, distill density plain L1
    mean, distill color MSE."""
    w = {"img": 1.0, "mask": 0.0, "eikonal": 0.0,
         "distill_density": 2.0, "distill_color": 3.0,
         "indicator_reg": 0.0}
    tr = Trainer(_StubModel(), w, teacher_model=_StubTeacher())
    extras = _fabricated_extras(rng)
    rgb = jnp.asarray(rng.uniform(size=(8, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(size=(8, 3)), jnp.float32)

    ret = tr.compute_loss(None, rgb, target, extras,
                          use_distill_loss=True, teacher_params={})
    losses = ret["losses"]

    gt_sdf = np.asarray(extras["xyz"]).sum(-1)
    gt_rgb = np.stack([np.asarray(extras["dirs"])[..., 0]] * 3, -1) * 0.5 + 0.5
    want_density = 2.0 * np.abs(
        gt_sdf[..., None] - np.asarray(extras["density"])).mean()
    want_color = 3.0 * ((np.asarray(extras["colors"]) - gt_rgb) ** 2).mean()
    want_img = np.abs(np.asarray(rgb) - np.asarray(target)).mean()

    assert float(losses["loss_density"]) == pytest.approx(
        float(want_density), rel=1e-5)
    assert float(losses["loss_color"]) == pytest.approx(
        float(want_color), rel=1e-5)
    assert float(losses["loss_img"]) == pytest.approx(
        float(want_img), rel=1e-5)


def test_compute_loss_masked_distill_optin(rng):
    w = {"img": 1.0, "mask": 0.0, "eikonal": 0.0,
         "distill_density": 1.0, "distill_color": 0.0,
         "indicator_reg": 0.0}
    tr = Trainer(_StubModel(), w, teacher_model=_StubTeacher(),
                 distill_density_clip=1.0)
    extras = _fabricated_extras(rng)
    rgb = jnp.zeros((8, 3), jnp.float32)
    ret = tr.compute_loss(None, rgb, rgb, extras,
                          use_distill_loss=True, teacher_params={})
    gt_sdf = np.asarray(extras["xyz"]).sum(-1)[..., None]
    m = np.abs(gt_sdf) <= 1.0
    assert m.any() and not m.all()
    want = np.abs(gt_sdf - np.asarray(extras["density"]))[m].mean()
    assert float(ret["losses"]["loss_density"]) == pytest.approx(
        float(want), rel=1e-5)
