"""End-to-end training tests: the jitted step optimizes a toy scene, and a
full `train()` run over a synthetic blender dataset exercises densify,
opacity reset, SH upgrade, eval, checkpointing."""

import json
import random
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.training.config import Config, config_from_dict
from easy_gaussian_splatting_tpu.training.trainer import (
    make_train_step,
    make_densify_step,
    train,
    get_render_fn,
)
from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
from easy_gaussian_splatting_tpu.models.render import CameraView, render
from easy_gaussian_splatting_tpu.utils.checkpoint import (
    find_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from test_scene import write_blender_scene


def _ref_cfg(**kw):
    base = dict(renderer="ref", raster_chunk=64)
    base.update(kw)
    return config_from_dict(base)


class TestTrainStep:
    def test_fit_single_view(self, rng):
        """Training steps on one view must drive the loss down hard."""
        cfg = _ref_cfg(lambda_ssim=0.2)
        n = 30
        xyzs = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
        rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
        model = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=64)
        adam = init_adam_state(model.params)

        K = jnp.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1.0]])
        w2c = jnp.eye(4).at[2, 3].set(4.0)
        camera = CameraView(w2c=w2c, K=K, width=32, height=24)

        # target: render of a perturbed copy of the same model
        target = render(
            model.params,
            model.alive,
            camera,
            1,
            jnp.zeros(3),
            jnp.zeros((64, 2)),
        ).image
        pert = model.params.replace(
            means=model.params.means
            + jnp.asarray(rng.normal(scale=0.05, size=(64, 3)).astype(np.float32)),
        )
        model = model.replace(params=pert)

        step_fn = make_train_step(cfg, get_render_fn(cfg))
        losses = []
        for i in range(60):
            model, adam, ld = step_fn(
                model, adam,
                w2c, K, target, jnp.zeros((24, 32)),
                np.float32(1e-3), np.bool_(False), np.bool_(False),
                np.bool_(False),
                height=24, width=32, sh_degree=1,
            )
            losses.append(float(ld["total"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < 0.5 * losses[0]

    def test_skip_all_freezes_params(self, rng):
        cfg = _ref_cfg()
        xyzs = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
        rgbs = rng.integers(0, 256, size=(10, 3)).astype(np.uint8)
        model = init_gaussian_state(xyzs, rgbs, 1, capacity=16)
        adam = init_adam_state(model.params)
        K = jnp.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1.0]])
        w2c = jnp.eye(4).at[2, 3].set(4.0)
        target = jnp.zeros((24, 32, 3))
        step_fn = make_train_step(cfg, get_render_fn(cfg))
        before = np.asarray(model.params.means)
        model2, adam2, _ = step_fn(
            model, adam, w2c, K, target, jnp.zeros((24, 32)),
            np.float32(1e-3), np.bool_(True), np.bool_(True), np.bool_(False),
            height=24, width=32, sh_degree=1,
        )
        np.testing.assert_array_equal(np.asarray(model2.params.means), before)
        assert int(adam2.steps["means"]) == 0
        # but statistics were still collected (do_stats=True)
        assert float(jnp.sum(model2.stats.collecting_counts)) > 0


class TestFullTraining:
    @pytest.mark.slow
    def test_train_smoke(self, tmp_path):
        write_blender_scene(tmp_path / "scene", n_train=3, n_test=2, size=24)
        out = tmp_path / "out"
        out.mkdir()
        cfg = _ref_cfg(
            data=str(tmp_path / "scene"),
            data_format="blender",
            output=str(out),
            white_background=True,
            total_iterations=24,
            save_model_iterations=[24],
            eval=True,
            eval_in_test=True,
            eval_every=12,
            eval_render_num=1,
            sh_degree=2,
            sh_degree_interval=8,
            refine_start=4,
            refine_stop=20,
            refine_every=8,
            reset_opacities_every=16,
            log_every=6,
            blender_init_points=40,
            initial_capacity=0,
            dataloader_workers=2,
        )
        random.seed(0)
        np.random.seed(0)
        loop = train(cfg)
        assert loop.step == 24
        # SH degree upgraded at steps 8, 16, 24 -> capped at 2
        assert loop.active_sh_degree == 2
        # checkpoint written and loadable
        cpt = find_checkpoint(out)
        state, sh_deg, step, adam = load_checkpoint(cpt)
        assert step == 24
        assert sh_deg == 2
        assert int(state.num_alive()) > 0
        # tensorboard dir exists
        assert (out / "tensorboard").exists()
        assert (out / "cameras.json").exists()

    def test_checkpoint_roundtrip_with_optimizer(self, tmp_path, rng):
        xyzs = rng.uniform(-1, 1, size=(10, 3)).astype(np.float32)
        rgbs = rng.integers(0, 256, size=(10, 3)).astype(np.uint8)
        model = init_gaussian_state(xyzs, rgbs, 2, capacity=16)
        adam = init_adam_state(model.params)
        p = tmp_path / "c" / "iterations_5.npz"
        save_checkpoint(p, model, 1, 5, adam=adam)
        state, sh_deg, step, adam2 = load_checkpoint(p)
        assert (sh_deg, step) == (1, 5)
        assert adam2 is not None
        np.testing.assert_array_equal(
            np.asarray(state.params.means), np.asarray(model.params.means)
        )
        assert int(state.num_alive()) == 10


def test_step_precompiler_warms_next_capacity():
    """StepPrecompiler traces+compiles the train step at a FUTURE
    capacity on its worker thread without touching the live model, and
    dedups repeated signatures."""
    import numpy as np

    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.precompile import (
        StepPrecompiler,
    )
    from easy_gaussian_splatting_tpu.training.trainer import (
        get_render_fn,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(64, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=128)
    adam = init_adam_state(model.params)
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))

    pre = StepPrecompiler(make_train_step, get_render_fn)
    fut = pre.warm(cfg, model, adam, 32, 32, sh_degree=1, capacity=256)
    assert fut is not None
    fut.result(timeout=300)  # raises if the background compile failed
    # model untouched, dedup works
    assert model.params.means.shape[0] == 128
    assert pre.warm(cfg, model, adam, 32, 32, 1, 256) is None
    pre.shutdown()


@pytest.mark.slow
def test_batched_step_matches_sequential_grads():
    """make_batched_train_step == mean of per-view gradients + B
    sequential update_statistics applications + one Adam update."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.models.density import update_statistics
    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import (
        adam_update,
        init_adam_state,
    )
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.trainer import (
        get_render_fn,
        make_batched_train_step,
        make_grad_fn,
    )

    h, w, b = 32, 48, 3
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(60, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=64)
    adam = init_adam_state(model.params)
    cfg = config_from_dict(dict(renderer="tiled", raster_chunk=32))
    render_fn = get_render_fn(cfg)

    w2cs = np.stack(
        [np.eye(4, dtype=np.float32) for _ in range(b)]
    )
    for i in range(b):
        w2cs[i, 2, 3] = 4.0 + 0.3 * i
        w2cs[i, 0, 3] = 0.1 * i
    Ks = np.stack(
        [np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]],
                  np.float32)] * b
    )
    images = rng.uniform(size=(b, h, w, 3)).astype(np.float32)
    masks = np.zeros((b, h, w), np.float32)

    # reference: per-view grads + sequential stats
    grad_fn = make_grad_fn(cfg, render_fn)
    grads_acc = None
    stats = model.stats
    for i in range(b):
        g, a, ld, radii = grad_fn(
            model, jnp.asarray(w2cs[i]), jnp.asarray(Ks[i]),
            jnp.asarray(images[i]), jnp.asarray(masks[i]),
            height=h, width=w, sh_degree=1,
        )
        stats = update_statistics(stats, radii, a, h, w)
        grads_acc = (
            g if grads_acc is None
            else jax.tree.map(jnp.add, grads_acc, g)
        )
    want_grads = jax.tree.map(lambda x: x / b, grads_acc)
    lrs = {
        "means": jnp.float32(1e-2),
        "log_scales": jnp.float32(cfg.log_scales_lr),
        "quats": jnp.float32(cfg.quats_lr),
        "sh_0": jnp.float32(cfg.sh_0_lr),
        "sh_rest": jnp.float32(cfg.sh_rest_lr),
        "logit_opacities": jnp.float32(cfg.logit_opacities_lr),
    }
    skips = {k: jnp.asarray(False) for k in lrs}
    want_params, want_adam = adam_update(
        model.params, want_grads, adam, lrs, skips
    )

    # batched step (fresh state: it donates)
    model2 = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=64)
    adam2 = init_adam_state(model2.params)
    step = make_batched_train_step(cfg, render_fn)
    m2, a2, ld2 = step(
        model2, adam2, jnp.asarray(w2cs), jnp.asarray(Ks),
        jnp.asarray(images), jnp.asarray(masks),
        np.float32(1e-2), np.bool_(True), np.bool_(False),
        np.bool_(False), height=h, width=w, sh_degree=1,
    )

    np.testing.assert_allclose(
        np.asarray(m2.params.means), np.asarray(want_params.means),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m2.stats.grad_norm_accum),
        np.asarray(stats.grad_norm_accum), rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(  # 1-ulp: division fuses differently
        np.asarray(m2.stats.max_radii), np.asarray(stats.max_radii),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m2.stats.collecting_counts),
        np.asarray(stats.collecting_counts),
    )
    assert "isects" in ld2
