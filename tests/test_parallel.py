"""Multi-chip tests on the virtual CPU mesh.

The rigorous equivalence check compares PRE-ADAM GRADIENTS of the sharded
paths against the single-device step (Adam's first step amplifies fp noise
for near-zero gradients, so post-update params are a poor comparison
surface). Both renderers are covered: the exact O(N*P) oracle (tight fp
tolerance) and the production tiled Pallas path (interpret mode on CPU;
tolerance covers MXU-lane/chunk reassociation between the stripe and
full-image tilings)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh
from easy_gaussian_splatting_tpu.parallel.gauss_shard import (
    make_gauss_sharded_grad_fn,
    make_gauss_sharded_train_step,
    shard_state,
)
from easy_gaussian_splatting_tpu.parallel.shard import (
    make_sharded_grad_fn,
    make_sharded_train_step,
)
from easy_gaussian_splatting_tpu.training.config import config_from_dict
from easy_gaussian_splatting_tpu.training.trainer import (
    get_render_fn,
    make_grad_fn,
    make_train_step,
)

H, W = 32, 48

# relative-to-gradient-scale tolerance per renderer: the oracle's sharded
# sum is a pure psum of disjoint stripe contributions (fp-noise exact);
# the tiled kernel's per-Gaussian reductions reassociate across the
# stripe/full tilings (measured ~1.1e-4 of max|g| at this scene scale)
GRAD_RTOL = {"ref": 1e-5, "tiled": 5e-4}
# the adaptive partition's arbitrary-row tile origins shift the
# tile-local sigma polynomial's cancellation, so borderline pixels can
# cross the SIGMA_EPS acceptance boundary (an isolated near-threshold
# alpha included on one tiling, excluded on the other) on top of
# reduction reassociation — wider bands than the aligned-uniform case
ADAPT_GRAD_RTOL = {"ref": 1e-5, "tiled": 5e-3}
LOSS_RTOL = {"uniform": 1e-6, "adaptive": 5e-5}


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


def _cfg(renderer, partition="uniform"):
    return config_from_dict(
        dict(
            renderer=renderer, raster_chunk=32,
            stripe_partition=partition,
        )
    )


def _assert_grads_match(g_ref, a_ref, g_test, a_test, rtol):
    flat_ref, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_test = jax.tree_util.tree_leaves(g_test)
    assert len(flat_ref) == len(flat_test)
    for (path, x), y in zip(flat_ref, flat_test):
        x, y = np.asarray(x), np.asarray(y)
        scale = max(np.abs(x).max(), 1e-8)
        np.testing.assert_allclose(
            y, x, atol=rtol * scale,
            err_msg=f"gradient mismatch at {jax.tree_util.keystr(path)}",
        )
    a_ref, a_test = np.asarray(a_ref), np.asarray(a_test)
    np.testing.assert_allclose(
        a_test, a_ref, atol=rtol * max(np.abs(a_ref).max(), 1e-8),
        err_msg="absgrad (densify statistics channel) mismatch",
    )


@pytest.mark.parametrize("partition", ["uniform", "adaptive"])
@pytest.mark.parametrize("renderer", ["ref", "tiled"])
@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_gradients_match_single_device(renderer, n_dev, partition):
    """Image-stripe sharding: psum'd pre-Adam gradients == monolithic
    (both the uniform and the content-adaptive stripe partitions)."""
    cfg = _cfg(renderer, partition)
    render_fn = get_render_fn(cfg)
    model, _, w2c, K, image, mask = _setup()

    g1, a1, ld1, r1 = make_grad_fn(cfg, render_fn)(
        model, w2c, K, image, mask, height=H, width=W, sh_degree=1
    )
    mesh = make_mesh(n_dev)
    g2, a2, ld2, r2 = make_sharded_grad_fn(cfg, mesh, render_fn, H, W)(
        model, w2c, K, image, mask, sh_degree=1
    )

    np.testing.assert_allclose(
        float(ld1["total"]), float(ld2["total"]),
        rtol=LOSS_RTOL[partition],
    )
    tol = (GRAD_RTOL if partition == "uniform" else ADAPT_GRAD_RTOL)
    _assert_grads_match(g1, a1, g2, a2, tol[renderer])
    # full-image projection geometry -> radii identical on every chip
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


@pytest.mark.parametrize("partition", ["uniform", "adaptive"])
@pytest.mark.parametrize("renderer", ["ref", "tiled"])
@pytest.mark.parametrize("n_dev", [2, 4])
def test_gauss_sharded_gradients_match_single_device(
    renderer, n_dev, partition
):
    """ZeRO-style sharding: all-gather params + reduce-scatter grads
    reproduces the monolithic pre-Adam gradients."""
    cfg = _cfg(renderer, partition)
    render_fn = get_render_fn(cfg)
    model, _, w2c, K, image, mask = _setup()

    g1, a1, ld1, r1 = make_grad_fn(cfg, render_fn)(
        model, w2c, K, image, mask, height=H, width=W, sh_degree=1
    )
    mesh = make_mesh(n_dev)
    smodel = shard_state(model, mesh)
    g2, a2, ld2, r2 = make_gauss_sharded_grad_fn(
        cfg, mesh, render_fn, H, W
    )(smodel, w2c, K, image, mask, sh_degree=1)

    np.testing.assert_allclose(
        float(ld1["total"]), float(ld2["total"]),
        rtol=LOSS_RTOL[partition],
    )
    tol = (GRAD_RTOL if partition == "uniform" else ADAPT_GRAD_RTOL)
    _assert_grads_match(g1, a1, g2, a2, tol[renderer])
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


@pytest.mark.parametrize("renderer", ["ref", "tiled"])
def test_sharded_step_matches_single_device(renderer):
    """Full-step plumbing (Adam update + densify statistics) on the
    stripe-sharded path. Gradient equality is asserted rigorously above;
    this covers the update/stats wiring, so tolerances absorb Adam's
    first-step amplification of fp noise. Runs the uniform partition —
    adaptive-partition gradient equality is asserted (with its
    reassociation band) in the grad tests above."""
    n_dev = 4
    cfg = _cfg(renderer, "uniform")
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

    np.testing.assert_allclose(
        float(ld1["total"]), float(ld2["total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1.params.means), np.asarray(m2.params.means),
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(m1.stats.grad_norm_accum),
        np.asarray(m2.stats.grad_norm_accum),
        atol=1e-6, rtol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(m1.stats.max_radii), np.asarray(m2.stats.max_radii)
    )
    np.testing.assert_allclose(
        np.asarray(m1.stats.collecting_counts),
        np.asarray(m2.stats.collecting_counts),
    )
    if renderer == "tiled":
        # the watchdog channel must ride the sharded loss dict too
        assert "isects" in ld2 and float(ld2["isects"]) > 0


@pytest.mark.parametrize("renderer", ["ref", "tiled"])
def test_gauss_sharded_step_matches_single_device(renderer):
    """Full-step plumbing on the ZeRO path: sharded Adam moments and
    sharded densify statistics match the monolithic step."""
    n_dev = 4
    cfg = _cfg(renderer, "uniform")
    render_fn = get_render_fn(cfg)
    model, adam, w2c, K, image, mask = _setup()

    single = make_train_step(cfg, render_fn)
    m1, a1, ld1 = single(
        model, adam, w2c, K, image, mask,
        np.float32(1e-2), np.bool_(True), np.bool_(False), np.bool_(False),
        height=H, width=W, sh_degree=1,
    )

    mesh = make_mesh(n_dev)
    model2, adam2, w2c, K, image, mask = _setup()
    model2 = shard_state(model2, mesh)
    adam2 = shard_state(adam2, mesh)
    step = make_gauss_sharded_train_step(cfg, mesh, render_fn, H, W)
    m2, a2, ld2 = step(
        model2, adam2, w2c, K, image, mask,
        np.float32(1e-2), np.bool_(True), np.bool_(False), np.bool_(False),
        sh_degree=1,
    )

    np.testing.assert_allclose(
        float(ld1["total"]), float(ld2["total"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(m1.params.means), np.asarray(m2.params.means), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(m1.stats.grad_norm_accum),
        np.asarray(m2.stats.grad_norm_accum),
        atol=1e-6, rtol=1e-3,
    )
    np.testing.assert_array_equal(
        np.asarray(m1.stats.max_radii), np.asarray(m2.stats.max_radii)
    )
    # optimizer moments live sharded but numerically match
    np.testing.assert_allclose(
        np.asarray(a1.mu.means), np.asarray(a2.mu.means), atol=1e-6,
        rtol=1e-3,
    )
    assert int(a2.steps["means"]) == 1
    if renderer == "tiled":
        assert "isects" in ld2 and float(ld2["isects"]) > 0


@pytest.mark.parametrize("partition", ["uniform", "adaptive"])
def test_striped_isect_counter_matches_step_channel(partition):
    """The mesh-aware autotune counter must agree with the per-chip
    intersection counts the sharded tiled step reports (under the same
    stripe partition)."""
    from easy_gaussian_splatting_tpu.parallel.shard import (
        make_striped_isect_counter,
    )

    cfg = _cfg("tiled", partition)
    render_fn = get_render_fn(cfg)
    model, _, w2c, K, image, mask = _setup()
    mesh = make_mesh(4)
    counts = make_striped_isect_counter(
        mesh, cfg.tile_size, cfg.max_tiles, cfg.max_tiles,
        ov_frac=cfg.ov_frac, partition=partition,
    )(model.params, model.alive, w2c, K, height=H, width=W)
    n_max = int(np.asarray(counts)[0])

    _, _, ld, _ = make_sharded_grad_fn(cfg, mesh, render_fn, H, W)(
        model, w2c, K, image, mask, sh_degree=1
    )
    assert n_max == int(ld["isects"])
    assert n_max > 0

    # per-chip mode: the unreduced matrix must be per-stripe counts whose
    # max equals the pmax the watchdog sees
    per_chip = np.asarray(
        make_striped_isect_counter(
            mesh, cfg.tile_size, cfg.max_tiles, cfg.max_tiles,
            ov_frac=cfg.ov_frac, reduce="none", partition=partition,
        )(model.params, model.alive, w2c, K, height=H, width=W)
    )
    assert per_chip.shape[0] == 4
    assert int(per_chip[:, 0].max()) == n_max


def test_isect_capacity_clamps():
    """max_isect_cap bounds by BOTH the HBM budget and the int32 DMA
    addressing limit of the gradient-row buffer."""
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        GRAD_ROW_BYTES,
        ISECT_ROW_LIMIT,
        max_isect_cap,
    )

    # small budget: HBM-bound (320 B per intersection slot)
    assert max_isect_cap(32) == int(32e6 / 320)
    # huge budget: addressing-bound, never above the 2^31-byte row limit
    assert max_isect_cap(1_000_000) == ISECT_ROW_LIMIT
    assert (ISECT_ROW_LIMIT + 512) * GRAD_ROW_BYTES <= 2**31


@pytest.mark.slow
def test_graft_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_train_loop_gauss_mesh(tmp_path):
    """Full train() smoke on a gauss:4 mesh with the TILED renderer,
    exercising the sharded step, the mesh-aware autotune/watchdog,
    gather->densify->reshard, and opacity reset on sharded state."""
    import random

    from easy_gaussian_splatting_tpu.training.trainer import train
    from test_scene import write_blender_scene

    write_blender_scene(tmp_path / "scene", n_train=3, n_test=1, size=24)
    cfg = config_from_dict(
        dict(
            data=str(tmp_path / "scene"),
            data_format="blender",
            output=None,
            white_background=True,
            total_iterations=14,
            save_model_iterations=[14],
            eval=False,
            eval_in_test=False,
            eval_every=100,
            sh_degree=1,
            sh_degree_interval=6,
            refine_start=2,
            refine_stop=12,
            refine_every=5,
            reset_opacities_every=10,
            log_every=5,
            renderer="tiled",
            raster_chunk=32,
            blender_init_points=24,
            initial_capacity=64,
            dataloader_workers=0,
            mesh_shape="gauss:4",
        )
    )
    random.seed(0)
    np.random.seed(0)
    loop = train(cfg)
    assert loop.step == 14
    assert int(loop.model.num_alive()) > 0


@pytest.mark.slow
def test_train_loop_tiles_mesh(tmp_path):
    """Full train() smoke on a tiles:4 mesh with the tiled renderer."""
    import random

    from easy_gaussian_splatting_tpu.training.trainer import train
    from test_scene import write_blender_scene

    write_blender_scene(tmp_path / "scene", n_train=3, n_test=1, size=24)
    cfg = config_from_dict(
        dict(
            data=str(tmp_path / "scene"),
            data_format="blender",
            output=None,
            white_background=True,
            total_iterations=8,
            save_model_iterations=[8],
            eval=False,
            eval_in_test=False,
            eval_every=100,
            sh_degree=1,
            sh_degree_interval=6,
            refine_start=2,
            refine_stop=6,
            refine_every=3,
            reset_opacities_every=10,
            log_every=5,
            renderer="tiled",
            raster_chunk=32,
            blender_init_points=24,
            initial_capacity=64,
            dataloader_workers=0,
            mesh_shape="tiles:4",
        )
    )
    random.seed(0)
    np.random.seed(0)
    loop = train(cfg)
    assert loop.step == 8
    assert int(loop.model.num_alive()) > 0


def _densify_setup(seed=0):
    """Model + crafted stats that trigger clones, splits, and prunes."""
    from easy_gaussian_splatting_tpu.models.gaussians import DensifyStats

    rng = np.random.default_rng(seed)
    xyzs = rng.uniform(-1, 1, size=(40, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(40, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=1, capacity=64)
    adam = init_adam_state(model.params)
    # shard layout on a 4-mesh is 4x16 rows; keep the clone/split/prune
    # rows in a shard WITH free slots (shard-local densify allocates
    # children in the parent's shard)
    accum = np.zeros(64, np.float32)
    accum[32:36] = 100.0  # rows 32-33 clone, 34-35 split (big scale)
    counts = np.ones(64, np.float32)
    stats = DensifyStats(
        grad_norm_accum=jnp.asarray(accum),
        collecting_counts=jnp.asarray(counts),
        max_radii=jnp.zeros(64),
    )
    logit = np.asarray(model.params.logit_opacities).copy()
    logit[36:38] = -12.0  # opacity ~ 6e-6 < min_opacity -> pruned
    log_scales = np.asarray(model.params.log_scales).copy()
    log_scales[34:36] = 1.0  # big -> split
    import dataclasses

    params = dataclasses.replace(
        model.params,
        logit_opacities=jnp.asarray(logit),
        log_scales=jnp.asarray(log_scales),
    )
    model = dataclasses.replace(model, params=params, stats=stats)
    return model, adam


def _dcfg_fixture(scale_thresh=0.5):
    from easy_gaussian_splatting_tpu.models.density import DensifyConfig

    return DensifyConfig(
        densify_grad_thresh=1.0,
        densify_scale_thresh=scale_thresh,
        num_splits=2,
        prune_radii_ratio_thresh=10.0,
        prune_scale_thresh=100.0,
        min_opacity=0.005,
    )


def _sorted_rows(x):
    x = np.asarray(x).reshape(len(x), -1)
    return x[np.lexsort(x.T[::-1])]


@pytest.mark.slow
def test_sharded_densify_matches_single_device():
    """Shard-local densify == single-device engine up to slot placement
    and split-sample RNG: identical info counts, identical alive-row
    multisets for everything RNG-independent (clone/survivor rows;
    split children's scales/quats are parent-derived)."""
    from easy_gaussian_splatting_tpu.models.density import densify_and_prune
    from easy_gaussian_splatting_tpu.parallel.gauss_shard import (
        make_sharded_densify_step,
    )

    dcfg = _dcfg_fixture()
    key = jax.random.PRNGKey(3)

    model, adam = _densify_setup()
    s1, a1, info1, ov1 = jax.jit(
        lambda m, a, k: densify_and_prune(m, a, k, dcfg)
    )(model, adam, key)

    mesh = make_mesh(4)
    model2, adam2 = _densify_setup()
    step = make_sharded_densify_step(dcfg, mesh)
    s2, a2, info2, ov2 = step(
        shard_state(model2, mesh), shard_state(adam2, mesh), key
    )

    assert not bool(ov1) and not bool(ov2)
    for k_ in info1:
        assert int(info1[k_]) == int(info2[k_]), k_
    alive1 = np.asarray(s1.alive)
    alive2 = np.asarray(s2.alive)
    assert alive1.sum() == alive2.sum()
    # RNG-independent per-row payloads must match as multisets
    for field in ("quats", "logit_opacities", "sh_0"):
        v1 = np.asarray(getattr(s1.params, field))[alive1]
        v2 = np.asarray(getattr(s2.params, field))[alive2]
        np.testing.assert_allclose(
            _sorted_rows(v1), _sorted_rows(v2), atol=1e-6,
            err_msg=field,
        )
    # scales are parent-derived even for splits (shrunk by 0.8*ns)
    np.testing.assert_allclose(
        _sorted_rows(np.asarray(s1.params.log_scales)[alive1]),
        _sorted_rows(np.asarray(s2.params.log_scales)[alive2]),
        atol=1e-6,
    )


def test_sharded_densify_growth_and_trainer_loop_path():
    """grow_state_sharded pads each shard equally and preserves content;
    the trainer's sharded growth loop retries overflow without a host
    gather."""
    from easy_gaussian_splatting_tpu.parallel.gauss_shard import (
        grow_state_sharded,
    )

    mesh = make_mesh(4)
    model, adam = _densify_setup()
    smodel = shard_state(model, mesh)
    sadam = shard_state(adam, mesh)
    g_model, g_adam = grow_state_sharded(smodel, sadam, 128, mesh)
    assert g_model.capacity == 128
    # per-shard layout: each 32-row shard = old 16-row shard + 16 dead
    alive = np.asarray(g_model.alive).reshape(4, 32)
    old_alive = np.asarray(model.alive).reshape(4, 16)
    np.testing.assert_array_equal(alive[:, :16], old_alive)
    assert not alive[:, 16:].any()
    np.testing.assert_allclose(
        _sorted_rows(np.asarray(g_model.params.means)[
            np.asarray(g_model.alive)]),
        _sorted_rows(np.asarray(model.params.means)[
            np.asarray(model.alive)]),
        atol=0,
    )
    # moments of the new slots are zero
    mu = np.asarray(g_adam.mu.means).reshape(4, 32, 3)
    assert not mu[:, 16:].any()


def test_device_cache_stripe_padding(tmp_path):
    """Mesh-padded device cache: image pad rows zero, mask pad rows ONE
    (ignored by the loss), true height preserved in the contract."""
    from easy_gaussian_splatting_tpu.scene.device_cache import build_cache
    from easy_gaussian_splatting_tpu.scene.scene import Scene
    from test_scene import write_blender_scene

    write_blender_scene(tmp_path / "scene", n_train=3, n_test=1, size=30)
    scene = Scene(
        str(tmp_path / "scene"), "blender", None, 10, True, 0.2,
        False, True, False, 0, True, blender_init_points=16,
    )
    cache = build_cache(scene, "train", 1024, pad_rows_to=4)
    assert cache is not None
    d = cache.get(0)
    assert d["height"] == 30 and d["image"].shape[0] == 32
    img = np.asarray(d["image"])
    msk = np.asarray(d["mask"])
    assert not img[30:].any()
    np.testing.assert_array_equal(msk[30:], 1.0)


@pytest.mark.slow
def test_train_loop_mesh_with_padded_device_cache(tmp_path):
    """Sharded train() smoke with the stripe-padded device cache active
    (image height NOT divisible by the mesh) — frames are device-resident
    and the loss matches the masked-pad semantics."""
    import random

    from easy_gaussian_splatting_tpu.training.trainer import train
    from test_scene import write_blender_scene

    write_blender_scene(tmp_path / "scene", n_train=3, n_test=1, size=30)
    cfg = config_from_dict(
        dict(
            data=str(tmp_path / "scene"),
            data_format="blender",
            output=None,
            white_background=True,
            total_iterations=6,
            save_model_iterations=[6],
            eval=False,
            eval_in_test=False,
            eval_every=100,
            sh_degree=1,
            sh_degree_interval=6,
            refine_start=2,
            refine_stop=5,
            refine_every=3,
            reset_opacities_every=10,
            log_every=5,
            renderer="tiled",
            raster_chunk=32,
            blender_init_points=24,
            initial_capacity=64,
            dataloader_workers=0,
            data_device_cache=True,
            mesh_shape="tiles:4",
        )
    )
    random.seed(0)
    np.random.seed(0)
    loop = train(cfg)
    assert loop.step == 6
    assert int(loop.model.num_alive()) > 0
