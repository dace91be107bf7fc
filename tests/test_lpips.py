"""LPIPS plumbing test: with a synthetic weights file, the JAX LPIPS
builds, runs, is zero for identical images and positive for different
ones. (Real VGG weights cannot be downloaded in this environment; value
parity is validated wherever weights are available.)"""

import numpy as np
import pytest


@pytest.fixture
def fake_weights(tmp_path, rng, monkeypatch):
    from easy_gaussian_splatting_tpu.evaluation.lpips import (
        VGG16_PLAN,
        LPIPS_TAPS,
        lpips_fn_or_none,
    )

    arrays = {}
    in_ch = 3
    conv_i = 0
    for item in VGG16_PLAN:
        if item == "M":
            continue
        arrays[f"conv{conv_i}_w"] = (
            rng.normal(size=(item, in_ch, 3, 3)).astype(np.float32) * 0.05
        )
        arrays[f"conv{conv_i}_b"] = np.zeros((item,), np.float32)
        in_ch = item
        conv_i += 1
    taps_channels = [64, 128, 256, 512, 512]
    for i, ch in enumerate(taps_channels):
        arrays[f"lin{i}_w"] = np.abs(
            rng.normal(size=(ch,)).astype(np.float32)
        )
    path = tmp_path / "w.npz"
    np.savez(path, **arrays)
    monkeypatch.setenv("EGS_TPU_LPIPS_WEIGHTS", str(path))
    lpips_fn_or_none.cache_clear()
    yield path
    lpips_fn_or_none.cache_clear()


def test_lpips_builds_and_discriminates(fake_weights, rng):
    from easy_gaussian_splatting_tpu.evaluation.lpips import lpips_fn_or_none

    fn = lpips_fn_or_none()
    assert fn is not None
    a = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    b = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    same = fn(a, a)
    diff = fn(a, b)
    assert abs(same) < 1e-6
    assert diff > 1e-4


def test_lpips_unavailable_without_weights(monkeypatch):
    from easy_gaussian_splatting_tpu.evaluation.lpips import lpips_fn_or_none

    monkeypatch.delenv("EGS_TPU_LPIPS_WEIGHTS", raising=False)
    lpips_fn_or_none.cache_clear()
    assert lpips_fn_or_none() is None
    lpips_fn_or_none.cache_clear()
