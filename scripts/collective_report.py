"""Collective inventory + overlap evidence for the sharded train steps.

Compiles both multi-chip modes on the 8-virtual-device CPU mesh and
reports, from the optimized HLO:
- every collective op (all-reduce / all-gather / reduce-scatter /
  collective-permute), its tensor shape, and its per-step bytes;
- whether the compiler emitted ASYNC collective pairs (``-start`` /
  ``-done``), i.e. whether communication is schedulable to overlap with
  the backward compute (on real TPUs the latency-hiding scheduler moves
  independent compute between the start/done pair; the CPU backend
  compiles collectives synchronously, so the structural inventory is the
  portable evidence this environment can produce — only one physical
  chip is attached).

Usage: EGS_TPU_FORCE_CPU=1 python scripts/collective_report.py
"""

import os
import re
import sys

sys.path.insert(0, ".")

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def inventory(lowered_text, label):
    ops = []
    total_bytes = 0
    for line in lowered_text.splitlines():
        m = re.search(
            r"=\s*(\([^)]*\)|\S+)\s+(all-reduce|all-gather|"
            r"reduce-scatter|collective-permute|all-to-all)"
            r"(-start|-done)?\(",
            line,
        )
        if not m:
            continue
        shapes = re.findall(r"(f32|bf16|s32|u32|pred)\[([\d,]*)\]", m.group(1))
        nbytes = 0
        for dt, dims in shapes:
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            nbytes += n * (2 if dt == "bf16" else 1 if dt == "pred" else 4)
        kind = m.group(2) + (m.group(3) or "")
        ops.append((kind, nbytes))
        if not (m.group(3) == "-done"):
            total_bytes += nbytes
    print(f"\n== {label} ==")
    by_kind = {}
    for kind, nbytes in ops:
        by_kind.setdefault(kind, [0, 0])
        by_kind[kind][0] += 1
        by_kind[kind][1] += nbytes
    for kind, (cnt, nbytes) in sorted(by_kind.items()):
        print(f"  {kind:28s} x{cnt:3d}  {nbytes/1e6:8.2f} MB")
    n_async = sum(1 for k, _ in ops if k.endswith("-start"))
    print(f"  total collective payload/step: {total_bytes/1e6:.2f} MB")
    print(
        f"  async start/done pairs: {n_async} "
        f"({'overlap-schedulable' if n_async else 'sync on this backend'})"
    )
    return total_bytes


def main():
    from easy_gaussian_splatting_tpu.models.gaussians import (
        init_gaussian_state,
    )
    from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
    from easy_gaussian_splatting_tpu.parallel.gauss_shard import (
        make_gauss_sharded_train_step,
        shard_state,
    )
    from easy_gaussian_splatting_tpu.parallel.mesh import make_mesh
    from easy_gaussian_splatting_tpu.parallel.shard import (
        make_sharded_train_step,
    )
    from easy_gaussian_splatting_tpu.training.config import config_from_dict
    from easy_gaussian_splatting_tpu.training.trainer import get_render_fn

    h, w = 64, 64
    n, cap = 4096, 8192
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    model = init_gaussian_state(
        rng.uniform(-1, 1, (n, 3)).astype(np.float32),
        rng.integers(0, 256, (n, 3)).astype(np.uint8),
        sh_degree=3,
        capacity=cap,
    )
    adam = init_adam_state(model.params)
    K = jnp.array([[64.0, 0, w / 2], [0, 64.0, h / 2], [0, 0, 1.0]])
    w2c = jnp.eye(4).at[2, 3].set(4.0)
    image = jnp.asarray(rng.uniform(size=(h, w, 3)).astype(np.float32))
    mask = jnp.zeros((h, w))
    args = (
        w2c, K, image, mask, np.float32(1e-3), np.bool_(True),
        np.bool_(False), np.bool_(False),
    )

    per_g_bytes = sum(
        np.prod(x.shape[1:], initial=1) * 4
        for x in jax.tree_util.tree_leaves(model.params)
    )
    print(
        f"capacity={cap} gaussians, per-gaussian param bytes="
        f"{per_g_bytes:.0f} (grads psum'd once per step)"
    )
    print(
        f"analytic tiles-mode grad all-reduce: "
        f"{cap * per_g_bytes / 1e6:.2f} MB/step + absgrad "
        f"{cap * 8 / 1e6:.2f} MB + stats psums"
    )

    step = make_sharded_train_step(cfg, mesh, get_render_fn(cfg), h, w)
    low = step.lower(model, adam, *args, sh_degree=3)
    inventory(low.compile().as_text(), "tiles:8 (image-stripe) step")

    gmodel = shard_state(model, mesh)
    gadam = shard_state(adam, mesh)
    gstep = make_gauss_sharded_train_step(cfg, mesh, get_render_fn(cfg), h, w)
    glow = gstep.lower(gmodel, gadam, *args, sh_degree=3)
    inventory(glow.compile().as_text(), "gauss:8 (ZeRO) step")


if __name__ == "__main__":
    main()
