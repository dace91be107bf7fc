"""Benchmark: full training-step throughput of the TPU-native 3DGS stack.

Self-contained (no dataset needed): builds synthetic mid-training-scale
scenes (800x800 camera — the nerf_synthetic regime the reference trains
at, ``/root/reference/configs/nerf_synthetic.yaml``) and times the
complete jitted train step — projection, binning, tiled Pallas
rasterization forward+backward, SSIM+L1 loss, densify statistics, grouped
Adam — end to end on the attached chip, at a MATRIX of Gaussian counts
(100k / 1M / 3M: the nerf_synthetic mid-train point, the tandt_db
mid-train point, and the tandt densified end-state regime).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
The headline value is the 100k point (comparable round-over-round);
``detail.scale_probe`` carries every point. ``vs_baseline`` divides by 10
train iters/s — a documented estimate of the torch+gsplat reference's
whole-run average on its required 16 GB-class GPU (the reference
publishes no speed numbers, SURVEY.md §6; derivation in BASELINE.md
"Derivation of the 10 it/s throughput baseline").
"""

import json
import sys
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 10.0
DEFAULT_PROBE_NS = (100_000, 1_000_000, 3_000_000)


def bench_point(n, h, w, tile_size=32, margin=1.2, iters=30, batch=1):
    import jax
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        BUDGET_CANDIDATES,
        _ov_capacity,
        make_isect_counter,
    )
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.trainer import (
        get_render_fn,
        make_batched_train_step,
        make_train_step,
    )

    from easy_gaussian_splatting_tpu.models.gaussians import (
        _round_up_capacity,
    )

    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    # default capacity headroom is 1.3x (the trainer's growth target);
    # above ~2M the per-capacity HBM costs (params+Adam ~1.2 KB/slot,
    # per-intersection buffers ~1.1 KB/slot) demand a tight ladder rung
    # — the regime a real 10M-scale run handles by sharding over a
    # gauss mesh (parallel/gauss_shard.py)
    capacity = None if n < 2_000_000 else _round_up_capacity(int(n * 1.05))
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3, capacity=capacity)
    adam = init_adam_state(model.params)
    cfg = config_from_dict(
        dict(renderer="tiled", white_background=True, tile_size=tile_size)
    )

    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)

    # size the intersection capacity + binning budgets like the trainer's
    # autotune does
    counter = make_isect_counter(cfg.tile_size, cfg.max_tiles, cfg.max_tiles)
    vals = np.asarray(
        counter(model.params, model.alive, w2c, K, height=h, width=w)
    )
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        max_isect_cap,
    )

    n_isect = int(vals[0])
    cap_lim = max_isect_cap(cfg.isect_hbm_budget_mb)
    import math

    cfg.isect_mult = (
        math.floor(
            min(max(0.25, n_isect * margin / model.capacity),
                cap_lim / model.capacity) * 1e3
        ) / 1e3
    )
    m_cells = cfg.max_tiles * cfg.max_tiles
    best_dom = None
    for bb, need in zip(BUDGET_CANDIDATES, vals[2:]):
        if bb >= m_cells:
            continue
        ovf = round(max(0.01, min(1.0, int(need) * 2.0 / model.capacity)), 3)
        dom = model.capacity * bb + m_cells * _ov_capacity(
            model.capacity, ovf
        )
        if best_dom is None or dom < best_dom:
            cfg.small_budget, cfg.ov_frac, best_dom = bb, ovf, dom
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)
    if batch > 1:
        # multi-camera step: B distinct views per jitted dispatch
        step_fn = make_batched_train_step(cfg, get_render_fn(cfg))
        w2cs = jnp.stack(
            [w2c.at[0, 3].add(0.05 * i) for i in range(batch)]
        )
        Ks = jnp.stack([K] * batch)
        images = jnp.stack(
            [jnp.roll(image, i, axis=0) for i in range(batch)]
        )
        masks = jnp.stack([mask] * batch)

        def one(model, adam):
            return step_fn(
                model, adam, w2cs, Ks, images, masks,
                np.float32(1e-3), np.bool_(True), np.bool_(False),
                np.bool_(False),
                height=h, width=w, sh_degree=3,
            )

    else:
        step_fn = make_train_step(cfg, get_render_fn(cfg))

        def one(model, adam):
            return step_fn(
                model, adam, w2c, K, image, mask,
                np.float32(1e-3), np.bool_(True), np.bool_(False),
                np.bool_(False),
                height=h, width=w, sh_degree=3,
            )

    # tunnel-honest timing (CLAUDE.md): block_until_ready can return
    # before remote execution completes — fetch a value that depends on
    # the final step's state to force the full chain
    def force(model, ld):
        return float(np.asarray(model.params.means[0, 0])) + float(
            np.asarray(ld["total"])
        )

    model, adam, ld = one(model, adam)  # compile
    force(model, ld)
    t0 = time.perf_counter()
    for _ in range(iters):
        model, adam, ld = one(model, adam)
    force(model, ld)
    dt = (time.perf_counter() - t0) / iters

    # speed-of-light step (HBM-bandwidth floor at v5e ~819 GB/s): every
    # load-bearing array touched the algorithmically-minimal number of
    # times at COMPACT widths — params/Adam (fwd read, bwd read, update
    # r+w), per-intersection features (pack w + kernel r fwd/bwd),
    # gradient rows (w + reduce r), one binning-sort pass over the
    # two-population domain, loss images. Real sorts take ~log-squared
    # passes and gathers are issue-rate-bound (~10 ns/row), so bw_util
    # reads as "how far from a perfectly streaming implementation" — the
    # roofline narrative lives in docs/PLAN.md.
    cap = model.capacity
    m_cells2 = cfg.max_tiles * cfg.max_tiles
    domain = cap * cfg.small_budget + m_cells2 * _ov_capacity(
        cap, cfg.ov_frac
    )
    icap = int(cap * cfg.isect_mult)
    per_view = (
        cap * (236 * 2 + 236 * 2 + 472 * 2)  # params fwd/bwd + Adam r/w
        + icap * (64 * 3 + 48 * 3)  # feats pack+2 kernel reads; grads
        + domain * 16  # one sort pass (key + payload, r+w)
        + h * w * 3 * 4 * 6  # render + L1/SSIM fwd+bwd images
    )
    sol_ms = batch * per_view / 819e9 * 1e3
    out = {
        "gaussians": n,
        "step_ms": round(dt * 1e3, 2),
        "it_per_s": round(batch / dt, 3),  # views (reference iters) / s
        "isects": n_isect,
        "mpix_per_s": round(batch * h * w / dt / 1e6, 2),
        "sol_ms": round(sol_ms, 2),
        "bw_util": round(sol_ms / (dt * 1e3), 3),
    }
    if batch > 1:
        out["camera_batch"] = batch
    return out


def main():
    import jax

    # usage: bench.py [N] [H W] [tile_size] [margin] [--batch=B]
    # (explicit N: single point — the profiling workflow; no args: the
    # full scale matrix)
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = 1
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    h, w = 800, 800
    tile_size, margin = 32, 1.2
    if len(argv) >= 3:
        h, w = int(argv[1]), int(argv[2])
    if len(argv) >= 4:
        tile_size = int(argv[3])
    if len(argv) >= 5:
        margin = float(argv[4])
    probe_ns = [int(argv[0])] if argv else list(DEFAULT_PROBE_NS)

    probes = []
    # default matrix: also measure a batched (multi-camera) 100k point —
    # at small N the chip is issue-rate-bound far below its bandwidth
    # (bw_util ~2%), and the batched step amortizes the fixed per-step
    # costs over B views; it_per_s counts VIEWS (reference iterations)
    batched_points = [] if argv else [(100_000, 4)]
    for n in probe_ns:
        # fewer timing iters at the big-N points (steps are ~10x longer).
        # Per-point retry: the remote TPU worker occasionally crashes /
        # restarts mid-session; one failed probe must not lose the whole
        # matrix artifact.
        last_err = None
        for attempt in range(3):
            try:
                probes.append(
                    bench_point(
                        n, h, w, tile_size, margin,
                        iters=30 if n <= 300_000 else 15,
                        batch=batch,
                    )
                )
                last_err = None
                break
            except Exception as e:  # noqa: BLE001
                last_err = e
                time.sleep(60 * (attempt + 1))
        if last_err is not None:
            probes.append(
                {"gaussians": n, "error": str(last_err)[:200]}
            )
    for n, b in batched_points:
        try:
            probes.append(
                bench_point(n, h, w, tile_size, margin, iters=15, batch=b)
            )
        except Exception as e:  # noqa: BLE001
            probes.append(
                {"gaussians": n, "camera_batch": b,
                 "error": str(e)[:200]}
            )
    ok = [p for p in probes if "error" not in p]
    if not ok:
        print(json.dumps({"metric": "train_iters_per_sec", "value": 0.0,
                          "unit": "it/s", "vs_baseline": 0.0,
                          "detail": {"scale_probe": probes}}))
        return
    head = ok[0]
    its = head["it_per_s"]
    print(
        json.dumps(
            {
                "metric": "train_iters_per_sec",
                "value": its,
                "unit": "it/s",
                "vs_baseline": round(its / BASELINE_ITERS_PER_SEC, 3),
                "detail": {
                    "step_ms": head["step_ms"],
                    "gaussians": head["gaussians"],
                    "image": f"{w}x{h}",
                    "mpix_per_s": head["mpix_per_s"],
                    "backend": jax.default_backend(),
                    "scale_probe": probes,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
