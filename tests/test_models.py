"""Tests for the model layer: init, rendering, loss, grouped Adam (validated
against torch.optim.Adam), and density control."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.models.gaussians import (
    GaussianParams,
    init_gaussian_state,
    grow_capacity,
    PARAM_NAMES,
)
from easy_gaussian_splatting_tpu.models.render import CameraView, render
from easy_gaussian_splatting_tpu.models.loss import loss_dict, composite_mask
from easy_gaussian_splatting_tpu.models.optimizer import (
    init_adam_state,
    adam_update,
    mask_moments,
)
from easy_gaussian_splatting_tpu.models.density import (
    DensifyConfig,
    densify_and_prune,
    reset_opacities,
    update_statistics,
)
from easy_gaussian_splatting_tpu.ops.sh import sh0_to_rgb


def _toy_state(rng, n=50, sh_degree=2, capacity=None):
    xyzs = rng.normal(size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    return init_gaussian_state(xyzs, rgbs, sh_degree, capacity=capacity)


def _camera(w=32, h=24):
    K = jnp.array([[30.0, 0, 16.0], [0, 30.0, 12.0], [0, 0, 1.0]])
    w2c = jnp.eye(4).at[2, 3].set(6.0)  # camera looking at origin from z=-6
    return CameraView(w2c=w2c, K=K, width=w, height=h)


class TestInit:
    def test_shapes_and_alive(self, rng):
        st = _toy_state(rng, n=50, sh_degree=3)
        assert st.capacity == 1024
        assert int(st.num_alive()) == 50
        assert st.params.sh_rest.shape == (1024, 15, 3)
        assert st.params.sh_0.shape == (1024, 1, 3)

    def test_sh0_roundtrip(self, rng):
        n = 20
        xyzs = rng.normal(size=(n, 3)).astype(np.float32)
        rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
        st = init_gaussian_state(xyzs, rgbs, 2)
        rgb_back = np.asarray(sh0_to_rgb(st.params.sh_0[:n, 0]))
        np.testing.assert_allclose(rgb_back, rgbs / 255.0, atol=1e-5)

    def test_opacity_init(self, rng):
        st = _toy_state(rng)
        opac = jax.nn.sigmoid(st.params.logit_opacities[:50])
        np.testing.assert_allclose(np.asarray(opac), 0.8, atol=1e-5)

    def test_scale_init_from_knn(self, rng):
        # regular grid with spacing 1 -> 3-NN mean dist 1 -> scale 0.5
        xs = np.arange(5, dtype=np.float32)
        grid = np.stack(np.meshgrid(xs, xs, xs), -1).reshape(-1, 3)
        st = init_gaussian_state(grid, np.zeros((125, 3), np.uint8), 1)
        scales = np.exp(np.asarray(st.params.log_scales[:125]))
        # interior points have all 3 NN at distance 1
        np.testing.assert_allclose(np.median(scales), 0.5, atol=1e-5)

    def test_grow(self, rng):
        st = _toy_state(rng)
        st2 = grow_capacity(st, 2048)
        assert st2.capacity == 2048
        assert int(st2.num_alive()) == 50
        np.testing.assert_allclose(
            np.asarray(st2.params.means[:1024]), np.asarray(st.params.means)
        )


class TestRender:
    def test_render_runs_and_is_finite(self, rng):
        st = _toy_state(rng)
        cam = _camera()
        out = render(
            st.params,
            st.alive,
            cam,
            sh_degree=0,
            background=jnp.ones(3),
            absgrad_dummy=jnp.zeros((st.capacity, 2)),
        )
        assert out.image.shape == (24, 32, 3)
        img = np.asarray(out.image)
        assert np.all(np.isfinite(img))
        assert img.min() >= 0.0 and img.max() <= 1.0
        # some gaussians visible
        assert int(np.sum(np.asarray(out.radii) > 0)) > 0

    def test_dead_slots_invisible(self, rng):
        st = _toy_state(rng)
        cam = _camera()
        out1 = render(
            st.params, st.alive, cam, 0, jnp.zeros(3),
            jnp.zeros((st.capacity, 2)),
        )
        # kill half the gaussians; image must change, killed ones contribute 0
        alive2 = np.asarray(st.alive).copy()
        alive2[:25] = False
        out2 = render(
            st.params, jnp.asarray(alive2), cam, 0, jnp.zeros(3),
            jnp.zeros((st.capacity, 2)),
        )
        assert not np.allclose(np.asarray(out1.image), np.asarray(out2.image))
        # all dead -> pure background
        out3 = render(
            st.params, jnp.zeros_like(st.alive), cam, 0,
            jnp.full((3,), 0.25), jnp.zeros((st.capacity, 2)),
        )
        np.testing.assert_allclose(np.asarray(out3.image), 0.25, atol=1e-6)

    def test_gradients_flow(self, rng):
        st = _toy_state(rng, n=20)
        cam = _camera()
        target = jnp.zeros((24, 32, 3))

        def loss(params):
            out = render(
                params, st.alive, cam, 0, jnp.ones(3),
                jnp.zeros((st.capacity, 2)),
            )
            return jnp.mean((out.image - target) ** 2)

        g = jax.grad(loss)(st.params)
        for name in PARAM_NAMES:
            arr = np.asarray(getattr(g, name))
            assert np.all(np.isfinite(arr)), name
        assert np.any(np.asarray(g.means[:20]) != 0)
        assert np.any(np.asarray(g.logit_opacities[:20]) != 0)
        # dead slots receive zero gradient
        assert np.all(np.asarray(g.means[20:]) == 0)


class TestLoss:
    def test_mask_compositing_zeroes_gradient(self, rng):
        gt = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        mask = jnp.zeros((16, 16)).at[:8].set(1.0)

        def f(render_img):
            return loss_dict(render_img, gt, mask, lambda_ssim=0.2)["total"]

        render_img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        g = np.asarray(jax.grad(f)(render_img))
        assert np.all(g[:8] == 0.0)  # masked rows: no gradient
        assert np.any(g[8:] != 0.0)

    def test_perfect_render_zero_loss(self, rng):
        gt = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        d = loss_dict(gt, gt, jnp.zeros((16, 16)), lambda_ssim=0.2)
        assert float(d["l1"]) < 1e-7
        assert float(d["ssim"]) < 1e-5
        assert float(d["total"]) < 1e-5

    def test_scale_reg(self, rng):
        log_scales = jnp.log(
            jnp.asarray([[1.0, 1.0, 1.0], [20.0, 1.0, 1.0]], jnp.float32)
        )
        alive = jnp.array([True, True])
        gt = jnp.zeros((16, 16, 3))
        d = loss_dict(
            gt, gt, jnp.zeros((16, 16)), 0.2,
            log_scales=log_scales, alive=alive,
            use_scale_regularization=True, max_scale_ratio=10.0,
            lambda_scale=0.1,
        )
        # ratios: 1 -> max(1,10)-10 = 0 ; 20 -> 10 ; mean = 5
        np.testing.assert_allclose(float(d["scale_reg"]), 5.0, rtol=1e-5)
        np.testing.assert_allclose(float(d["total"]), 0.5, rtol=1e-5)


class TestAdam:
    def test_matches_torch_adam(self, rng):
        import torch

        n = 16
        lrs = {
            "means": 1e-2, "log_scales": 5e-3, "quats": 1e-3,
            "sh_0": 2e-3, "sh_rest": 1e-4, "logit_opacities": 5e-2,
        }
        shapes = {
            "means": (n, 3), "log_scales": (n, 3), "quats": (n, 4),
            "sh_0": (n, 1, 3), "sh_rest": (n, 8, 3), "logit_opacities": (n,),
        }
        init = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
        grads_seq = [
            {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
            for _ in range(5)
        ]

        # torch reference
        tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
        topt = torch.optim.Adam(
            [{"params": [tparams[k]], "lr": lrs[k], "name": k} for k in shapes]
        )
        for g in grads_seq:
            for k in shapes:
                tparams[k].grad = torch.tensor(g[k])
            topt.step()
            topt.zero_grad()

        # ours
        params = GaussianParams(**{k: jnp.asarray(v) for k, v in init.items()})
        state = init_adam_state(params)
        jlrs = {k: jnp.asarray(v, jnp.float32) for k, v in lrs.items()}
        for g in grads_seq:
            gp = GaussianParams(**{k: jnp.asarray(v) for k, v in g.items()})
            params, state = adam_update(params, gp, state, jlrs)

        for k in shapes:
            np.testing.assert_allclose(
                np.asarray(getattr(params, k)),
                tparams[k].detach().numpy(),
                atol=1e-5, rtol=1e-4, err_msg=k,
            )

    def test_skip_group(self, rng):
        params = GaussianParams(
            means=jnp.ones((4, 3)), log_scales=jnp.ones((4, 3)),
            quats=jnp.ones((4, 4)), sh_0=jnp.ones((4, 1, 3)),
            sh_rest=jnp.ones((4, 3, 3)), logit_opacities=jnp.ones((4,)),
        )
        grads = jax.tree.map(jnp.ones_like, params)
        state = init_adam_state(params)
        lrs = {k: jnp.asarray(0.1) for k in PARAM_NAMES}
        skips = {k: jnp.asarray(k == "means") for k in PARAM_NAMES}
        p1, s1 = adam_update(params, grads, state, lrs, skips)
        np.testing.assert_allclose(np.asarray(p1.means), 1.0)  # untouched
        assert int(s1.steps["means"]) == 0
        assert int(s1.steps["quats"]) == 1
        assert not np.allclose(np.asarray(p1.quats), 1.0)

    def test_mask_moments(self, rng):
        params = GaussianParams(
            means=jnp.ones((4, 3)), log_scales=jnp.ones((4, 3)),
            quats=jnp.ones((4, 4)), sh_0=jnp.ones((4, 1, 3)),
            sh_rest=jnp.ones((4, 3, 3)), logit_opacities=jnp.ones((4,)),
        )
        grads = jax.tree.map(jnp.ones_like, params)
        state = init_adam_state(params)
        lrs = {k: jnp.asarray(0.1) for k in PARAM_NAMES}
        _, state = adam_update(params, grads, state, lrs)
        keep = jnp.array([True, False, True, False])
        s2 = mask_moments(state, keep)
        mu = np.asarray(s2.mu.means)
        assert np.all(mu[1] == 0) and np.all(mu[3] == 0)
        assert np.all(mu[0] != 0)
        # group-scoped masking leaves other groups alone
        s3 = mask_moments(state, jnp.zeros(4, bool), group="logit_opacities")
        assert np.all(np.asarray(s3.mu.logit_opacities) == 0)
        assert np.all(np.asarray(s3.mu.means) != 0)


def _density_cfg(**kw):
    base = dict(
        densify_grad_thresh=0.5,
        densify_scale_thresh=1.0,
        num_splits=2,
        prune_radii_ratio_thresh=0.15,
        prune_scale_thresh=10.0,
        min_opacity=0.005,
    )
    base.update(kw)
    return DensifyConfig(**base)


def _manual_state(n=8, cap=32, scale=0.5, opacity=0.8):
    rngl = np.random.default_rng(1)
    means = rngl.normal(size=(cap, 3)).astype(np.float32)
    log_scales = np.full((cap, 3), np.log(scale), np.float32)
    quats = np.tile([[1.0, 0, 0, 0]], (cap, 1)).astype(np.float32)
    sh_0 = rngl.normal(size=(cap, 1, 3)).astype(np.float32)
    sh_rest = np.zeros((cap, 3, 3), np.float32)
    logit = np.full((cap,), np.log(opacity / (1 - opacity)), np.float32)
    from easy_gaussian_splatting_tpu.models.gaussians import (
        GaussianModelState,
        zero_stats,
    )

    params = GaussianParams(
        means=jnp.asarray(means), log_scales=jnp.asarray(log_scales),
        quats=jnp.asarray(quats), sh_0=jnp.asarray(sh_0),
        sh_rest=jnp.asarray(sh_rest), logit_opacities=jnp.asarray(logit),
    )
    alive = jnp.asarray(np.arange(cap) < n)
    return GaussianModelState(params=params, alive=alive, stats=zero_stats(cap))


class TestDensity:
    def test_update_statistics(self):
        st = _manual_state()
        radii = np.zeros(32, np.float32)
        radii[:4] = [10, 20, 0, 5]
        absgrad = np.zeros((32, 2), np.float32)
        absgrad[:4] = [[3e-4, 4e-4], [1e-3, 0], [1.0, 1.0], [0, 0]]
        stats = update_statistics(
            st.stats, jnp.asarray(radii), jnp.asarray(absgrad), 100, 200
        )
        np.testing.assert_allclose(
            np.asarray(stats.max_radii[:4]), [0.05, 0.1, 0.0, 0.025]
        )
        np.testing.assert_allclose(
            np.asarray(stats.collecting_counts[:4]), [1, 1, 0, 1]
        )
        np.testing.assert_allclose(
            np.asarray(stats.grad_norm_accum[0]), 5e-4 * 200, rtol=1e-5
        )
        # invisible gaussian (radius 0) accumulates nothing
        np.testing.assert_allclose(np.asarray(stats.grad_norm_accum[2]), 0.0)

    def test_clone_small_high_grad(self):
        st = _manual_state(n=8, scale=0.5)
        # gaussian 0 has high accumulated gradient
        stats = st.stats.replace(
            grad_norm_accum=st.stats.grad_norm_accum.at[0].set(10.0),
            collecting_counts=st.stats.collecting_counts.at[:8].set(1.0),
        )
        st = st.replace(stats=stats)
        adam = init_adam_state(st.params)
        new_st, _, info, overflow = densify_and_prune(
            st, adam, jax.random.PRNGKey(0), _density_cfg()
        )
        assert not bool(overflow)
        assert int(info["clone"]) == 1
        assert int(info["split"]) == 0
        assert int(new_st.num_alive()) == 9
        # the clone is a copy of gaussian 0
        alive = np.asarray(new_st.alive)
        new_slot = [i for i in range(32) if alive[i] and i >= 8]
        assert len(new_slot) == 1
        np.testing.assert_allclose(
            np.asarray(new_st.params.means[new_slot[0]]),
            np.asarray(st.params.means[0]),
        )

    def test_split_large_high_grad(self):
        st = _manual_state(n=8, scale=2.0)  # max_scale 2.0 >= thresh 1.0
        stats = st.stats.replace(
            grad_norm_accum=st.stats.grad_norm_accum.at[3].set(10.0),
            collecting_counts=st.stats.collecting_counts.at[:8].set(1.0),
        )
        st = st.replace(stats=stats)
        adam = init_adam_state(st.params)
        new_st, new_adam, info, overflow = densify_and_prune(
            st, adam, jax.random.PRNGKey(0), _density_cfg()
        )
        assert not bool(overflow)
        assert int(info["split"]) == 1
        # parent pruned, 2 children added: 8 - 1 + 2 = 9
        assert int(new_st.num_alive()) == 9
        # children have shrunk scales 2.0 / (0.8 * 2); the pruned parent's
        # slot may be reused for a child, so identify children by scale
        alive = np.asarray(new_st.alive)
        scales = np.exp(np.asarray(new_st.params.log_scales))[:, 0]
        children = [
            i for i in range(32) if alive[i] and abs(scales[i] - 1.25) < 1e-4
        ]
        survivors = [
            i for i in range(32) if alive[i] and abs(scales[i] - 2.0) < 1e-4
        ]
        assert len(children) == 2
        assert len(survivors) == 7

    def test_prune_low_opacity(self):
        st = _manual_state(n=8)
        logit = np.asarray(st.params.logit_opacities).copy()
        logit[2] = -10.0  # opacity ~ 4.5e-5 < 0.005
        st = st.replace(
            params=st.params.replace(logit_opacities=jnp.asarray(logit))
        )
        adam = init_adam_state(st.params)
        new_st, _, info, _ = densify_and_prune(
            st, adam, jax.random.PRNGKey(0), _density_cfg()
        )
        assert not bool(new_st.alive[2])
        assert int(info["prune_low_opacity"]) == 1
        assert int(new_st.num_alive()) == 7

    def test_prune_large_radii(self):
        st = _manual_state(n=8)
        stats = st.stats.replace(max_radii=st.stats.max_radii.at[1].set(0.5))
        st = st.replace(stats=stats)
        adam = init_adam_state(st.params)
        new_st, _, info, _ = densify_and_prune(
            st, adam, jax.random.PRNGKey(0), _density_cfg()
        )
        assert not bool(new_st.alive[1])
        assert int(info["prune_large_radii"]) == 1

    def test_stats_reset_and_moment_surgery(self):
        st = _manual_state(n=8, scale=0.5)
        stats = st.stats.replace(
            grad_norm_accum=st.stats.grad_norm_accum.at[0].set(10.0),
            collecting_counts=st.stats.collecting_counts.at[:8].set(1.0),
        )
        st = st.replace(stats=stats)
        adam = init_adam_state(st.params)
        grads = jax.tree.map(jnp.ones_like, st.params)
        lrs = {k: jnp.asarray(0.01) for k in PARAM_NAMES}
        _, adam = adam_update(st.params, grads, adam, lrs)
        new_st, new_adam, info, _ = densify_and_prune(
            st, adam, jax.random.PRNGKey(0), _density_cfg()
        )
        np.testing.assert_allclose(np.asarray(new_st.stats.grad_norm_accum), 0.0)
        # new slot has zero moments, old surviving slots keep theirs
        alive = np.asarray(new_st.alive)
        new_slots = [i for i in range(32) if alive[i] and i >= 8]
        mu = np.asarray(new_adam.mu.means)
        assert np.all(mu[new_slots[0]] == 0.0)
        assert np.all(mu[1] != 0.0)
        assert int(new_adam.steps["means"]) == 1  # step count preserved

    def test_overflow_flag(self):
        st = _manual_state(n=30, cap=32, scale=0.5)
        stats = st.stats.replace(
            grad_norm_accum=st.stats.grad_norm_accum.at[:30].set(10.0),
            collecting_counts=st.stats.collecting_counts.at[:30].set(1.0),
        )
        st = st.replace(stats=stats)
        adam = init_adam_state(st.params)
        _, _, _, overflow = densify_and_prune(
            st, adam, jax.random.PRNGKey(0), _density_cfg()
        )
        assert bool(overflow)  # 30 clones > 2 free slots

    def test_reset_opacities(self):
        st = _manual_state(n=8)
        adam = init_adam_state(st.params)
        grads = jax.tree.map(jnp.ones_like, st.params)
        lrs = {k: jnp.asarray(0.01) for k in PARAM_NAMES}
        _, adam = adam_update(st.params, grads, adam, lrs)
        new_st, new_adam = reset_opacities(st, adam, min_opacity=0.005)
        opac = jax.nn.sigmoid(new_st.params.logit_opacities)
        np.testing.assert_allclose(np.asarray(opac[:8]), 0.01, rtol=1e-4)
        assert np.all(np.asarray(new_adam.mu.logit_opacities) == 0.0)
        assert np.any(np.asarray(new_adam.mu.means) != 0.0)


class TestCompaction:
    def test_compact_for_inference_shrinks_to_ladder(self):
        from easy_gaussian_splatting_tpu.models.gaussians import (
            _round_up_capacity,
            compact_for_inference,
        )

        st = _manual_state(n=8, cap=4096)
        out = compact_for_inference(st)
        assert out.capacity == _round_up_capacity(8) == 1024
        assert int(out.num_alive()) == 8
        # already minimal: no-op (same object)
        assert compact_for_inference(out) is out

    def test_compact_preserves_render_and_adam_alignment(self):
        from easy_gaussian_splatting_tpu.models.gaussians import (
            compact_capacity,
        )
        from easy_gaussian_splatting_tpu.models.optimizer import (
            permute_adam_state,
        )

        st = _manual_state(n=8, cap=64)
        # scatter the alive rows (non-contiguous) like post-prune state
        rngl = np.random.default_rng(3)
        alive = np.zeros(64, bool)
        alive[rngl.choice(64, size=10, replace=False)] = True
        st = st.replace(alive=jnp.asarray(alive))
        adam = init_adam_state(st.params)
        adam = adam.replace(
            mu=jax.tree.map(lambda x: x + 1.5, st.params),
            nu=jax.tree.map(lambda x: x * x + 0.25, st.params),
        )

        cam = CameraView(
            w2c=jnp.eye(4, dtype=jnp.float32).at[2, 3].set(6.0),
            K=jnp.array(
                [[40.0, 0, 16.0], [0, 40.0, 12.0], [0, 0, 1.0]], jnp.float32
            ),
            width=32,
            height=24,
        )
        bg = jnp.zeros(3)

        def img_of(state):
            return render(
                state.params, state.alive, cam, 1, bg,
                jnp.zeros((state.capacity, 2), jnp.float32),
            ).image

        before = np.asarray(img_of(st))
        new_st, perm = compact_capacity(st, 16)
        new_adam = permute_adam_state(adam, perm)

        assert new_st.capacity == 16
        assert int(new_st.num_alive()) == 10
        # alive rows packed to the front, original order preserved
        assert np.all(np.asarray(new_st.alive[:10]))
        orig_alive_idx = np.nonzero(alive)[0]
        np.testing.assert_array_equal(
            np.asarray(new_st.params.means[:10]),
            np.asarray(st.params.means)[orig_alive_idx],
        )
        # render unchanged
        after = np.asarray(img_of(new_st))
        np.testing.assert_allclose(after, before, atol=1e-6)
        # adam moments follow their rows
        np.testing.assert_array_equal(
            np.asarray(new_adam.mu.means[:10]),
            np.asarray(adam.mu.means)[orig_alive_idx],
        )
        np.testing.assert_array_equal(
            np.asarray(new_adam.nu.sh_rest[:10]),
            np.asarray(adam.nu.sh_rest)[orig_alive_idx],
        )

    def test_compact_rejects_too_small(self):
        from easy_gaussian_splatting_tpu.models.gaussians import (
            compact_capacity,
        )

        st = _manual_state(n=8, cap=32)
        with pytest.raises(ValueError):
            compact_capacity(st, 4)
