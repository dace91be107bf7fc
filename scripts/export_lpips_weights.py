"""Export LPIPS(VGG) weights to the .npz this framework consumes.

Run this in any environment that has torchvision + the lpips (or
torchmetrics) package with downloaded weights, then point
``EGS_TPU_LPIPS_WEIGHTS`` at the output file. (The training environment
for this repo has no network egress, so weights must be brought in as an
artifact.)

Usage: python scripts/export_lpips_weights.py [out.npz]
"""

import sys

import numpy as np


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz"
    try:
        import torchvision
    except ImportError:
        sys.exit(
            "torchvision is required (run this in an environment that "
            "has it; this container does not)"
        )
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    arrays = {}
    conv_i = 0
    for layer in vgg:
        import torch.nn as nn

        if isinstance(layer, nn.Conv2d):
            arrays[f"conv{conv_i}_w"] = layer.weight.detach().numpy()
            arrays[f"conv{conv_i}_b"] = layer.bias.detach().numpy()
            conv_i += 1

    # LPIPS linear heads: try the `lpips` package first, else torchmetrics
    lin = None
    try:
        import lpips as lpips_pkg

        net = lpips_pkg.LPIPS(net="vgg")
        lin = [l.model[1].weight.detach().numpy() for l in net.lins]
    except ImportError:
        try:
            from torchmetrics.functional.image.lpips import _NoTrainLpips

            net = _NoTrainLpips(net="vgg")
            lin = [l.model[1].weight.detach().numpy() for l in net.lins]
        except ImportError:
            sys.exit("need the `lpips` package or torchmetrics for the "
                     "linear heads")
    for i, w in enumerate(lin):
        arrays[f"lin{i}_w"] = w.reshape(-1)

    np.savez(out, **arrays)
    print(f"wrote {out} ({conv_i} convs, {len(lin)} linear heads)")


if __name__ == "__main__":
    main()
