"""Multi-chip tests on the virtual CPU mesh: the sharded train step must
produce the same parameter updates and statistics as the single-device
step (stripes + all_gather + psum == monolithic render)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh
from easy_gaussian_splatting_tpu.parallel.shard import (
    make_sharded_train_step,
)
from easy_gaussian_splatting_tpu.training.config import config_from_dict
from easy_gaussian_splatting_tpu.training.trainer import (
    get_render_fn,
    make_train_step,
)

H, W = 32, 48


def _setup(seed=0):
    rng = np.random.default_rng(seed)
    xyzs = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(60, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=64)
    adam = init_adam_state(model.params)
    K = jnp.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1.0]])
    w2c = jnp.eye(4).at[2, 3].set(4.0)
    image = jnp.asarray(rng.uniform(size=(H, W, 3)).astype(np.float32))
    mask = jnp.zeros((H, W))
    return model, adam, w2c, K, image, mask


@pytest.mark.parametrize("n_dev", [2, 4, 8])
def test_sharded_step_matches_single_device(n_dev):
    cfg = config_from_dict(dict(renderer="ref", raster_chunk=32))
    render_fn = get_render_fn(cfg)
    model, adam, w2c, K, image, mask = _setup()

    single = make_train_step(cfg, render_fn)
    m1, a1, ld1 = single(
        model, adam, w2c, K, image, mask,
        np.float32(1e-2), np.bool_(True), np.bool_(False), np.bool_(False),
        height=H, width=W, sh_degree=1,
    )

    mesh = make_mesh(n_dev)
    # fresh identical state (the single-device step donated its inputs)
    model2, adam2, w2c, K, image, mask = _setup()
    sharded = make_sharded_train_step(cfg, mesh, render_fn, H, W)
    m2, a2, ld2 = sharded(
        model2, adam2, w2c, K, image, mask,
        np.float32(1e-2), np.bool_(True), np.bool_(False), np.bool_(False),
        sh_degree=1,
    )

    # stripe culling cuts sub-threshold tail contributions of Gaussians
    # whose 3-sigma box misses a stripe (the tiled renderer's binning makes
    # the same cut); allow the resulting small forward difference
    np.testing.assert_allclose(
        float(ld1["total"]), float(ld2["total"]), rtol=2e-3
    )
    # Adam's first-step update is ~lr*g/(|g|+eps): for near-zero grads it
    # amplifies fp noise up to +-lr, so post-update params get a loose
    # tolerance; the rigorous equivalence check is on the statistics below.
    np.testing.assert_allclose(
        np.asarray(m1.params.means), np.asarray(m2.params.means),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(m1.params.logit_opacities),
        np.asarray(m2.params.logit_opacities),
        atol=5e-3,
    )
    # densify statistics match (absgrad psum + radii pmax)
    np.testing.assert_allclose(
        np.asarray(m1.stats.grad_norm_accum),
        np.asarray(m2.stats.grad_norm_accum),
        atol=5e-3, rtol=5e-2,
    )
    # stripe viewports have a smaller vertical fov, which shifts the EWA
    # Jacobian clamp slightly -> radii can differ by a pixel or two
    np.testing.assert_allclose(
        np.asarray(m1.stats.max_radii), np.asarray(m2.stats.max_radii),
        atol=2.5 / max(H, W),
    )
    np.testing.assert_allclose(
        np.asarray(m1.stats.collecting_counts),
        np.asarray(m2.stats.collecting_counts),
    )


def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
