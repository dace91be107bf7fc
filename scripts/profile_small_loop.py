"""Why is real training at 128x128 ~170 ms/step when compute is ~3 ms?

Times the jitted train step in a host loop at small resolution under
three readback policies: none, float-every-10 (the trainer's), async.

Usage: python scripts/profile_small_loop.py [N] [H] [W] [steps]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from easy_gaussian_splatting_tpu.models.gaussians import init_gaussian_state
from easy_gaussian_splatting_tpu.models.optimizer import init_adam_state
from easy_gaussian_splatting_tpu.training.config import config_from_dict
from easy_gaussian_splatting_tpu.training.trainer import (
    get_render_fn,
    make_train_step,
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    rng = np.random.default_rng(0)
    xyzs = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    rgbs = rng.integers(0, 256, size=(n, 3)).astype(np.uint8)
    model = init_gaussian_state(xyzs, rgbs, sh_degree=3)
    adam = init_adam_state(model.params)
    cfg = config_from_dict(dict(renderer="tiled", white_background=True))
    K = jnp.array(
        [[120.0, 0, w / 2], [0, 120.0, h / 2], [0, 0, 1.0]], jnp.float32
    )
    w2c_np = np.eye(4, dtype=np.float32)
    w2c_np[2, 3] = 4.0
    image_np = rng.uniform(size=(h, w, 3)).astype(np.float32)
    mask_np = np.zeros((h, w), np.float32)
    step_fn = make_train_step(cfg, get_render_fn(cfg))

    def one(model, adam):
        return step_fn(
            model, adam, jnp.asarray(w2c_np), jnp.asarray(K),
            jnp.asarray(image_np), jnp.asarray(mask_np),
            np.float32(1e-3), np.bool_(True), np.bool_(False),
            np.bool_(False), height=h, width=w, sh_degree=3,
        )

    m, a, ld = one(model, adam)
    jax.block_until_ready(ld)
    print(f"compiled; N={n} {w}x{h}")

    images = [
        rng.uniform(size=(h, w, 3)).astype(np.float32) for _ in range(16)
    ]

    def run(policy):
        nonlocal m, a
        t0 = time.perf_counter()
        pend = []
        for i in range(steps):
            if policy.startswith("fresh"):
                img = images[i % 16]
                m, a, ld = step_fn(
                    m, a, jnp.asarray(w2c_np), jnp.asarray(K),
                    jnp.asarray(img), jnp.asarray(mask_np),
                    np.float32(1e-3), np.bool_(True), np.bool_(False),
                    np.bool_(False), height=h, width=w, sh_degree=3,
                )
                if policy == "fresh10" and i % 10 == 0:
                    _ = {k: float(v) for k, v in ld.items()}
                continue
            m, a, ld = one(m, a)
            if policy == "float10" and i % 10 == 0:
                _ = {k: float(v) for k, v in ld.items()}
            elif policy == "async10" and i % 10 == 0:
                for v in ld.values():
                    v.copy_to_host_async()
                pend.append(ld)
                if len(pend) > 3:
                    old = pend.pop(0)
                    _ = {k: float(v) for k, v in old.items()}
        np.asarray(m.params.means[0, 0])  # force the chain
        dt = (time.perf_counter() - t0) / steps * 1e3
        print(f"{policy:10s} {dt:8.2f} ms/step")

    for policy in ("none", "fresh", "fresh10", "none"):
        run(policy)


if __name__ == "__main__":
    main()
