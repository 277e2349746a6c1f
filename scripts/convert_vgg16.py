"""Convert a torchvision VGG16 checkpoint to the flax .npz used by
TriPlanarPerceptualLoss (exact parity with the reference's ImageNet VGG loss,
loss_multiscale.py:54-137, once a weight file is available offline).

Usage:
    python scripts/convert_vgg16.py /path/to/vgg16-397923af.pth vgg16_relu3_3.npz

Then train with:
    hvc train --config ... --vgg-weights vgg16_relu3_3.npz
"""

import argparse
import sys

sys.path.insert(0, ".")

from hybrid_vit_cascade_tpu.losses.vgg_weights import convert_torch_file


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="torchvision VGG16 .pth/.pt state_dict")
    ap.add_argument("dst", help="output .npz path")
    args = ap.parse_args()
    variables = convert_torch_file(args.src, args.dst)
    n = sum(v.size for layer in variables["params"].values() for v in layer.values())
    print(f"wrote {args.dst}: 7 conv layers, {n:,} params")


if __name__ == "__main__":
    main()
