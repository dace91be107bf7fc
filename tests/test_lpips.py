"""LPIPS tests.

The JAX implementation is validated AT FULL DEPTH (all 13 VGG16 convs,
both pools, all 5 taps, unit-normalization, linear heads, spatial mean)
against an independent torch implementation of the same published
pipeline — so whenever real pretrained weights are supplied via
``EGS_TPU_LPIPS_WEIGHTS`` the values match reference LPIPS-VGG math. Also
covers the deterministic-proxy fallback (reproducible, discriminative,
zero on identical images) and the loud failure on a missing weights path.
"""

import numpy as np
import pytest

from easy_gaussian_splatting_tpu.evaluation.lpips import (
    LPIPS_TAPS,
    TAP_CHANNELS,
    VGG16_PLAN,
    build_lpips_device_fn,
    get_lpips,
    proxy_weights,
)


def _torch_lpips(weights, a, b):
    """Independent torch implementation of the LPIPS(VGG) pipeline."""
    import torch
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def prep(img):
        x = torch.from_numpy(img).permute(2, 0, 1)[None] * 2.0 - 1.0
        return (x - shift) / scale

    def feats(x):
        out = []
        conv_i = 0
        for item in VGG16_PLAN:
            if item == "M":
                x = F.max_pool2d(x, 2, 2)
            else:
                x = F.conv2d(
                    x,
                    torch.from_numpy(weights[f"conv{conv_i}_w"]),
                    torch.from_numpy(weights[f"conv{conv_i}_b"]),
                    padding=1,
                )
                x = F.relu(x)
                if conv_i in LPIPS_TAPS:
                    out.append(x)
                conv_i += 1
        return out

    total = 0.0
    for i, (xa, xb) in enumerate(zip(feats(prep(a)), feats(prep(b)))):
        na = xa / xa.norm(dim=1, keepdim=True).clamp_min(1e-10)
        nb = xb / xb.norm(dim=1, keepdim=True).clamp_min(1e-10)
        w = torch.from_numpy(weights[f"lin{i}_w"]).view(1, -1, 1, 1)
        total += ((na - nb) ** 2 * w).sum(dim=1).mean().item()
    return total


def test_lpips_matches_torch_at_full_depth(rng):
    """JAX LPIPS == independent torch LPIPS for arbitrary full-shape
    weights — validates every stage of the pipeline."""
    weights = proxy_weights(seed=7)
    # non-zero biases + non-uniform heads so nothing cancels trivially
    conv_i = 0
    for item in VGG16_PLAN:
        if item == "M":
            continue
        weights[f"conv{conv_i}_b"] = (
            rng.normal(size=(item,)).astype(np.float32) * 0.01
        )
        conv_i += 1
    for i, ch in enumerate(TAP_CHANNELS):
        weights[f"lin{i}_w"] = np.abs(
            rng.normal(size=(ch,)).astype(np.float32)
        )

    a = rng.uniform(size=(64, 64, 3)).astype(np.float32)
    b = np.clip(
        a + rng.normal(size=a.shape).astype(np.float32) * 0.1, 0, 1
    ).astype(np.float32)

    fn = build_lpips_device_fn(weights)
    got = float(fn(a, b))
    want = _torch_lpips(weights, a, b)
    np.testing.assert_allclose(got, want, rtol=2e-4)
    assert got > 1e-5


def test_proxy_is_deterministic_and_discriminates(rng):
    w1, w2 = proxy_weights(), proxy_weights()
    for k in w1:
        np.testing.assert_array_equal(w1[k], w2[k])

    fn = build_lpips_device_fn(w1)
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    noisy = np.clip(
        a + rng.normal(size=a.shape).astype(np.float32) * 0.05, 0, 1
    ).astype(np.float32)
    very_noisy = np.clip(
        a + rng.normal(size=a.shape).astype(np.float32) * 0.3, 0, 1
    ).astype(np.float32)
    assert float(fn(a, a)) == pytest.approx(0.0, abs=1e-6)
    d1, d2 = float(fn(a, noisy)), float(fn(a, very_noisy))
    assert 0.0 < d1 < d2  # monotone in perturbation size


def test_get_lpips_proxy_fallback_and_missing_path_error(monkeypatch):
    monkeypatch.delenv("EGS_TPU_LPIPS_WEIGHTS", raising=False)
    get_lpips.cache_clear()
    lp = get_lpips()
    assert lp.kind == "proxy"
    a = np.zeros((16, 16, 3), np.float32)
    assert lp(a, a) == pytest.approx(0.0, abs=1e-6)

    monkeypatch.setenv("EGS_TPU_LPIPS_WEIGHTS", "/nonexistent/weights.npz")
    get_lpips.cache_clear()
    with pytest.raises(FileNotFoundError):
        get_lpips()
    get_lpips.cache_clear()


def test_get_lpips_loads_real_weights_file(tmp_path, monkeypatch):
    path = tmp_path / "w.npz"
    np.savez(path, **proxy_weights(seed=3))
    monkeypatch.setenv("EGS_TPU_LPIPS_WEIGHTS", str(path))
    get_lpips.cache_clear()
    lp = get_lpips()
    assert lp.kind == "vgg"
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    b = rng.uniform(size=(16, 16, 3)).astype(np.float32)
    assert lp(a, b) > 0.0
    get_lpips.cache_clear()

class _FakeScene:
    """Minimal Scene stand-in for evaluator metric-key tests."""

    def __init__(self, size=16):
        rng = np.random.default_rng(0)
        self._data = {
            "height": size,
            "width": size,
            "w2c": np.eye(4, dtype=np.float32),
            "K": np.array(
                [[size, 0, size / 2], [0, size, size / 2], [0, 0, 1]],
                np.float32,
            ),
            "image": rng.uniform(size=(size, size, 3)).astype(np.float32),
            "mask": np.zeros((size, size), np.float32),
        }

    def nbr_data(self, split):
        return 1

    def get_data(self, split, idx):
        return dict(self._data)


def _run_evaluator_once():
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.evaluation.evaluator import Evaluator
    from easy_gaussian_splatting_tpu.models.render import RenderOutput

    def render_fn(params, alive, camera, sh_degree, background, absd):
        img = jnp.broadcast_to(
            background[None, None, :], (camera.height, camera.width, 3)
        )
        return RenderOutput(
            image=img,
            alpha=jnp.zeros((camera.height, camera.width)),
            radii=jnp.zeros((4,)),
        )

    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )

    model = init_gaussian_state(
        np.zeros((4, 3), np.float32),
        np.zeros((4, 3), np.uint8),
        sh_degree=1,
    )
    ev = Evaluator(eval_render_num=1, render_fn=render_fn)
    metrics = ev.evaluate(
        _FakeScene(),
        "eval",
        model,
        1,
        jnp.zeros((3,), jnp.float32),
        num_workers=0,
    )
    return ev, metrics


def test_evaluator_emits_lpips_proxy_key_for_proxy_weights(monkeypatch):
    monkeypatch.delenv("EGS_TPU_LPIPS_WEIGHTS", raising=False)
    get_lpips.cache_clear()
    ev, metrics = _run_evaluator_once()
    assert ev.lpips.kind == "proxy"
    assert "lpips_proxy" in metrics and "lpips" not in metrics
    get_lpips.cache_clear()


def test_evaluator_emits_lpips_key_for_real_weights(tmp_path, monkeypatch):
    path = tmp_path / "w.npz"
    np.savez(path, **proxy_weights(seed=3))
    monkeypatch.setenv("EGS_TPU_LPIPS_WEIGHTS", str(path))
    get_lpips.cache_clear()
    ev, metrics = _run_evaluator_once()
    assert ev.lpips.kind == "vgg"
    assert "lpips" in metrics and "lpips_proxy" not in metrics
    get_lpips.cache_clear()
