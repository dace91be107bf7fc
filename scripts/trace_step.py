"""Capture a jax.profiler trace of the jitted train step and aggregate
on-device op times from the Chrome-trace JSON (no TensorBoard needed).

Usage: python scripts/trace_step.py [N] [H] [W] [--top K]
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.trainer import (
        get_render_fn,
        make_train_step,
    )
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        make_isect_counter,
    )

    top = 45
    argv = sys.argv[1:]
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    n = int(argv[0]) if len(argv) > 0 else 100_000
    h = int(argv[1]) if len(argv) > 1 else 800
    w = int(argv[2]) if len(argv) > 2 else 800

    from easy_gaussian_splatting_tpu.models.gaussians import (
        _round_up_capacity,
    )
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        BUDGET_CANDIDATES,
        _ov_capacity,
    )

    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    capacity = None if n < 2_000_000 else _round_up_capacity(int(n * 1.05))
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3, capacity=capacity)
    adam = init_adam_state(model.params)
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))

    K = jnp.array(
        [[1111.0, 0, w / 2], [0, 1111.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(4.0)
    counter = make_isect_counter(cfg.tile_size, cfg.max_tiles, cfg.max_tiles)
    vals = np.asarray(
        counter(model.params, model.alive, w2c, K, height=h, width=w)
    )
    n_isect = int(vals[0])
    cfg.isect_mult = round(max(0.25, n_isect * 1.2 / model.capacity), 3)
    # budget/ov autotune exactly like bench.py so the trace matches the
    # bench configuration
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
    print(
        f"capacity={model.capacity} isects={n_isect} "
        f"b={cfg.small_budget} ov_frac={cfg.ov_frac} "
        f"isect_mult={cfg.isect_mult} domain={best_dom}"
    )
    step_fn = make_train_step(cfg, get_render_fn(cfg))
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w), jnp.float32)

    def one(model, adam):
        return step_fn(
            model, adam, w2c, K, image, mask,
            np.float32(1e-3), np.bool_(True), np.bool_(False),
            np.bool_(False),
            height=h, width=w, sh_degree=3,
        )

    model, adam, ld = one(model, adam)  # compile
    jax.block_until_ready(ld)

    logdir = "/tmp/egs_trace"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(5):
        model, adam, ld = one(model, adam)
    jax.block_until_ready(ld)
    jax.profiler.stop_trace()

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for f in files:
        with gzip.open(f, "rt") as fh:
            tr = json.load(fh)
        pid_names = {}
        for ev in tr["traceEvents"]:
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev["pid"]] = ev["args"].get("name", "")
        pid_ok = {
            p for p, nm in pid_names.items()
            if "TPU" in nm or "/device:" in nm
        }
        tid_names = {}
        for ev in tr["traceEvents"]:
            if ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
        print({p: pid_names[p] for p in pid_ok})
        for ev in tr["traceEvents"]:
            if ev.get("ph") != "X" or ev.get("pid") not in pid_ok:
                continue
            tname = tid_names.get((ev["pid"], ev["tid"]), "")
            if "XLA Ops" not in tname:
                continue
            name = ev.get("name", "")
            dur = ev.get("dur", 0) / 1e3  # ms
            agg[name] += dur
            cnt[name] += 1
            total += dur
    items = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"\ntotal XLA-op time {total/5:.2f} ms/step")
    for name, ms in items[:top]:
        print(f"{ms/5:9.3f} ms  x{cnt[name]//5:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
