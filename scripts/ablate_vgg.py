"""Ablation: stage-2 training with the random-frozen tri-planar perceptual
loss vs without it (vgg weight 0).

Why: the reference's TriPlanarVGGLoss (loss_multiscale.py:54-137) uses
ImageNet-pretrained VGG16 weights, which are unobtainable offline in this
environment; our TriPlanarPerceptualLoss runs the same architecture with
fixed-seed random-frozen filters (a standard perceptual proxy — random
convnet features correlate with perceptual similarity). This script
QUANTIFIES the deviation instead of asserting it: two otherwise identical
stage-2 runs on the same synthetic dataset/seed, identical init, reporting
final held-out PSNR/SSIM with and without the perceptual term. Results are
recorded in docs/ROUND_NOTES.md.

Usage: python scripts/ablate_vgg.py [--epochs 8] [--patients 12] [--res 64]
(res 64 keeps the run small; the loss weighting matches the stage-2 recipe.)
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(vgg_weight: float, args, save_dir: str) -> dict:
    from hybrid_vit_cascade_tpu.config import Config, StageConfig
    from hybrid_vit_cascade_tpu.training import Trainer

    cfg = Config()
    cfg.model.family = "cascade"
    cfg.model.voxel_dim = 64
    cfg.model.xray_feature_dim = 64
    cfg.model.stage_depths = (2, 2, 1)
    cfg.model.stage_heads = (4, 4, 4)
    cfg.model.stage_sizes = (args.res // 2, args.res, args.res * 2)
    cfg.model.dtype = "bfloat16"
    cfg.data.synthetic = True
    cfg.data.synthetic_patients = args.patients
    cfg.data.xray_size = 128
    cfg.data.train_split = 0.75
    cfg.data.val_split = 0.25
    cfg.training.seed = 0
    cfg.training.stages = {
        "stage1": StageConfig(args.epochs, 4, 1e-3, (args.res // 2,) * 3),
        "stage2": StageConfig(args.epochs * 2, 2, 5e-4, (args.res,) * 3),
        "stage3": StageConfig(1, 1, 1e-4, (args.res * 2,) * 3),  # config-complete, not trained
    }
    cfg.loss.stage2 = {"l1": 1.0, "ssim": 0.5, "vgg": vgg_weight, "tv": 0.02, "freq": 0.05}
    cfg.checkpoints.save_dir = save_dir
    cfg.checkpoints.save_every = 0
    t = Trainer(cfg)
    return t.fit_cascade(stages=("stage1", "stage2"), resume=False, progress=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--patients", type=int, default=12)
    ap.add_argument("--res", type=int, default=64)
    ap.add_argument("--out", default="/tmp/ablate_vgg")
    args = ap.parse_args()

    results = {}
    for tag, w in [("random_vgg", 0.1), ("no_vgg", 0.0)]:
        m = run(w, args, f"{args.out}/{tag}")
        results[tag] = {k: round(float(v), 4) for k, v in m.items()}
        print(f"[{tag}] {results[tag]}")
    delta = {
        "d_psnr": round(results["random_vgg"]["psnr"] - results["no_vgg"]["psnr"], 3),
        "d_ssim": round(results["random_vgg"]["ssim"] - results["no_vgg"]["ssim"], 4),
    }
    print(json.dumps({"results": results, "delta": delta}, indent=2))


if __name__ == "__main__":
    main()
