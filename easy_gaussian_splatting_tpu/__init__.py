"""easy_gaussian_splatting_tpu — a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of the reference
``li199603/easy_gaussian_splatting`` (CUDA/torch/gsplat), built TPU-first:

- the differentiable rasterizer (gsplat's CUDA kernels in the reference,
  ``/root/reference/model/gaussian.py:8,353-367``) is implemented as a pure-JAX
  oracle renderer plus tiled Pallas TPU kernels with a hand-derived VJP;
- the training loop, densify/split/clone/prune engine, losses and metrics are
  pure functions over pytrees under ``jit`` with static shapes
  (fixed-capacity Gaussian buffers + alive masks);
- multi-chip scaling uses ``jax.sharding.Mesh`` + ``shard_map`` with XLA
  collectives instead of any NCCL-style backend.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# 3DGS compositing and its densification statistics are sensitive to matmul
# precision; TPU's default bf16-pass matmuls cost ~1e-3 absolute error on
# f32 inputs. Force full-f32 MXU passes framework-wide (the hot Pallas
# kernels request f32 accumulation explicitly as well).
_jax.config.update("jax_default_matmul_precision", "highest")

# Escape hatch for CI / containers that pin jax to an accelerator platform
# programmatically (env JAX_PLATFORMS alone cannot override a plugin that
# calls jax.config.update at interpreter start).
if _os.environ.get("EGS_TPU_FORCE_CPU", "") == "1":
    _jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: XLA compiles of the fused train step take
# ~1 min (more over a remote-TPU tunnel); cache them across processes.
if _os.environ.get("EGS_TPU_NO_COMPILE_CACHE", "") != "1":
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.expanduser("~/.cache/egs_tpu_xla"),
    )
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
