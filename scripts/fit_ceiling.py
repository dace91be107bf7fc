"""Measure a procedural scene's fit ceiling: render the GROUND-TRUTH
Gaussian mixture through the production tiled renderer at the eval
cameras and PSNR it against the dataset images.

The dataset is realizable by construction (its images were rendered from
a Gaussian mixture), so this ceiling isolates everything a PERFECT
optimizer could not remove: PNG u8 quantization of the stored images and
tiled-vs-oracle renderer deltas. A trained model's eval PSNR reads as
"gap to this number".

Usage: python scripts/fit_ceiling.py --data <dataset dir> \
           --gt-gaussians 20000 --gt-sh-degree 2 \
           [--format colmap] [--layout unbounded] [--aniso 4.0] \
           [--frames 4] [--seed 0]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--format", default="blender",
                    choices=("blender", "colmap"))
    ap.add_argument("--gt-gaussians", type=int, default=20000)
    ap.add_argument("--gt-sh-degree", type=int, default=2)
    ap.add_argument("--layout", default="box",
                    choices=("box", "unbounded"))
    ap.add_argument("--aniso", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--frames", type=int, default=4)
    args = ap.parse_args()

    import jax.numpy as jnp

    from easy_gaussian_splatting_tpu.models.gaussians import (
        GaussianParams,
    )
    from easy_gaussian_splatting_tpu.models.render import CameraView
    from easy_gaussian_splatting_tpu.ops.rasterize_tiled import (
        make_tiled_render_fn,
    )
    from easy_gaussian_splatting_tpu.scene.scene import Scene
    from easy_gaussian_splatting_tpu.utils.synthetic import (
        make_gt_gaussians,
    )

    # white background only on the blender path — mirrors the settings
    # validate_e2e trains with for each format
    white_bg = args.format == "blender"
    scene = Scene(
        args.data, args.format, None, 100, True, 0.2, False, True,
        False, 0, white_bg, blender_init_points=16,
    )
    means, scales, quats, shs, opac = make_gt_gaussians(
        args.gt_gaussians, args.seed, sh_degree=args.gt_sh_degree,
        layout=args.layout, aniso=args.aniso,
    )
    n = means.shape[0]
    params = GaussianParams(
        means=jnp.asarray(means),
        log_scales=jnp.log(jnp.asarray(scales)),
        quats=jnp.asarray(quats),
        sh_0=jnp.asarray(shs[:, :1]),
        sh_rest=jnp.asarray(shs[:, 1:]),
        logit_opacities=jnp.log(opac) - jnp.log1p(-opac),
    )
    alive = jnp.ones((n,), bool)
    render_fn = make_tiled_render_fn(isect_mult=12)
    background = (
        jnp.ones((3,), jnp.float32) if white_bg
        else jnp.zeros((3,), jnp.float32)
    )

    psnrs = []
    n_eval = min(scene.nbr_data("eval"), args.frames)
    for i in range(n_eval):
        d = scene.get_data("eval", i)
        camera = CameraView(
            w2c=jnp.asarray(d["w2c"]), K=jnp.asarray(d["K"]),
            width=d["width"], height=d["height"],
        )
        out = render_fn(
            params, alive, camera, args.gt_sh_degree, background,
            jnp.zeros((n, 2), jnp.float32),
        )
        img = np.asarray(out.image)
        gt = d["image"]
        # same mask compositing as the evaluator (masked pixels excluded)
        m = d["mask"][..., None]
        img = m * gt + (1.0 - m) * img
        mse = float(np.mean((img - gt) ** 2))
        psnr = -10.0 * np.log10(max(mse, 1e-12))
        psnrs.append(psnr)
        print(f"frame {i}: ceiling psnr={psnr:.2f}", flush=True)
    print(
        f"CEILING: mean psnr over {n_eval} eval frames = "
        f"{np.mean(psnrs):.2f} dB (PNG quantization + renderer deltas; "
        f"a perfect fit of this dataset cannot exceed it)"
    )


if __name__ == "__main__":
    main()
