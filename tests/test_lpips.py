"""Pure-JAX VGG-LPIPS math (weights are synthetic here: the real
torchvision/lpips files are loaded in deployment via load_lpips_weights;
offline environments skip the metric via lpips_available)."""
import numpy as np
import pytest

from neumesh_tpu.ops.lpips import (_CHANNELS, _VGG_CONVS, load_lpips_weights,
                                   lpips, lpips_available)


def synthetic_weights(seed=0):
    rng = np.random.default_rng(seed)
    convs = []
    in_c = 3
    for out_c, _ in _VGG_CONVS:
        convs.append({
            "w": rng.normal(size=(out_c, in_c, 3, 3)).astype(np.float32)
            * (1.0 / np.sqrt(in_c * 9)),
            "b": np.zeros(out_c, np.float32),
        })
        in_c = out_c
    lins = [np.abs(rng.normal(size=c)).astype(np.float32) / c
            for c in _CHANNELS]
    return {"convs": convs, "lins": lins, "calibrated": False}


def test_lpips_zero_for_identical_images():
    w = synthetic_weights()
    img = np.random.default_rng(1).uniform(size=(32, 32, 3)).astype(
        np.float32)
    d = np.asarray(lpips(w, img, img))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_lpips_symmetric_and_sensitive():
    w = synthetic_weights()
    rng = np.random.default_rng(2)
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    b = np.clip(a + rng.normal(size=a.shape) * 0.1, 0, 1).astype(np.float32)
    c = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    dab = float(np.asarray(lpips(w, a, b)))
    dba = float(np.asarray(lpips(w, b, a)))
    dac = float(np.asarray(lpips(w, a, c)))
    assert dab > 0
    np.testing.assert_allclose(dab, dba, rtol=1e-5)
    assert dac > dab  # unrelated image is farther than a perturbation


def test_lpips_batched():
    w = synthetic_weights()
    rng = np.random.default_rng(3)
    a = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    b = rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    d = np.asarray(lpips(w, a, b))
    assert d.shape == (2,)


def test_lpips_unavailable_offline(tmp_path, monkeypatch):
    monkeypatch.delenv("NEUMESH_LPIPS_VGG", raising=False)
    monkeypatch.delenv("NEUMESH_LPIPS_LIN", raising=False)
    assert load_lpips_weights() is None
    assert not lpips_available()


def test_lpips_loads_torch_vgg_statedict(tmp_path):
    """A torchvision-layout vgg16 state_dict round-trips through the
    pure-python reader into the conv stack."""
    torch = pytest.importorskip("torch")
    sd = {}
    in_c = 3
    for out_c, idx in _VGG_CONVS:
        sd[f"features.{idx}.weight"] = torch.randn(out_c, in_c, 3, 3)
        sd[f"features.{idx}.bias"] = torch.randn(out_c)
        in_c = out_c
    path = str(tmp_path / "vgg16.pth")
    torch.save(sd, path)
    w = load_lpips_weights(vgg_path=path)
    assert w is not None and not w["calibrated"]
    assert w["convs"][0]["w"].shape == (64, 3, 3, 3)
    img = np.random.default_rng(0).uniform(size=(16, 16, 3)).astype(
        np.float32)
    assert float(np.asarray(lpips(w, img, img))) < 1e-6
