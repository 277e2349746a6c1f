"""Unified CLI — `python -m hybrid_vit_cascade_tpu.cli <cmd>`.

One entry point replaces the reference's 11 training scripts, 4 inference
scripts and 10 shell launchers (SURVEY.md §2.5-2.7):

  train    — any model family from a JSON config (stagewise for cascade)
  infer    — checkpoint → NIfTI/PNG/metrics export
  eval     — full-dataset metric summary (evaluation_metrics.json)
  inspect  — dump checkpoint keys/shapes
  bench    — single-chip throughput benchmark (also: repo-root bench.py)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def _load_cfg(args):
    from .config import Config

    cfg = Config.from_json(args.config) if args.config else Config()
    if getattr(args, "synthetic", False):
        cfg.data.synthetic = True
    if getattr(args, "family", None):
        cfg.model.family = args.family
    if getattr(args, "epochs", None) is not None:
        cfg.training.num_epochs = args.epochs
    if getattr(args, "save_dir", None):
        cfg.checkpoints.save_dir = args.save_dir
    if getattr(args, "data_path", None):
        cfg.data.dataset_path = args.data_path
    return cfg


def cmd_train(args):
    import os

    if os.environ.get("HVC_MULTIHOST"):  # multi-host over DCN: same train step
        import jax

        jax.distributed.initialize()

    from .training import Trainer

    cfg = _load_cfg(args)
    if getattr(args, "profile_dir", None):
        cfg.training.profile_dir = args.profile_dir
    if getattr(args, "debug_nans", False):
        cfg.training.debug_nans = True
    if getattr(args, "vgg_weights", None):
        cfg.loss.vgg_weights = args.vgg_weights
    if getattr(args, "viz_every", None):
        cfg.training.viz_every = args.viz_every
    trainer = Trainer(cfg)
    metrics = trainer.fit(lr_override=args.lr, resume=not args.no_resume)
    print(json.dumps({"final": metrics}))


def cmd_infer(args):
    from .config import data_volume_size
    from .inference import InferenceEngine
    from .data import SyntheticCTDataset, PatientDRRDataset

    engine = InferenceEngine(args.checkpoint)
    cfg = engine.cfg
    if args.pa_xray or args.lat_xray:
        # raw X-ray pair straight from image files, no dataset folder
        # (ref inference_visualization.py:196-248)
        if not (args.pa_xray and args.lat_xray):
            raise SystemExit("--pa-xray and --lat-xray must be given together")
        from .inference.infer import load_xray_pair

        from .data.dataset import NORMALIZATION_PRESETS

        # raw images follow the checkpoint's normalization preset — the same
        # range the dataset feeds at train time ([-1,1] for soft_tissue)
        xr = load_xray_pair(args.pa_xray, args.lat_xray, size=cfg.data.xray_size,
                            normalize_range=NORMALIZATION_PRESETS[cfg.data.normalization]["range"])
        upscale = tuple(int(x) for x in args.upscale.split(",")) if args.upscale else None
        paths = engine.export(xr, args.output, prefix="raw_pair", upscale=upscale,
                              denormalize=args.denormalize)
        print(json.dumps({"exports": paths}, indent=2))
        return
    if args.synthetic or cfg.data.synthetic:
        ds = SyntheticCTDataset(num_patients=max(1, args.index + 1),
                               volume_size=data_volume_size(cfg), xray_size=cfg.data.xray_size)
    else:
        ds = PatientDRRDataset(args.data_path or cfg.data.dataset_path,
                               target_xray_size=cfg.data.xray_size,
                               target_volume_size=data_volume_size(cfg),
                               normalization=cfg.data.normalization)
    item = ds[args.index]
    upscale = tuple(int(x) for x in args.upscale.split(",")) if args.upscale else None
    paths = engine.export(item["drr_stacked"][None], args.output, prefix=item["patient_id"],
                          upscale=upscale, denormalize=args.denormalize,
                          target=item["ct_volume"][None])
    metrics = engine.evaluate_sample(item)
    print(json.dumps({"exports": paths, "metrics": metrics}, indent=2))


def cmd_eval(args):
    from .config import data_volume_size
    from .inference import InferenceEngine
    from .data import SyntheticCTDataset, PatientDRRDataset, create_train_val_datasets

    engine = InferenceEngine(args.checkpoint)
    cfg = engine.cfg
    if args.synthetic or cfg.data.synthetic:
        ds = SyntheticCTDataset(num_patients=cfg.data.synthetic_patients,
                                volume_size=data_volume_size(cfg), xray_size=cfg.data.xray_size)
    else:
        ds = PatientDRRDataset(args.data_path or cfg.data.dataset_path,
                               target_xray_size=cfg.data.xray_size,
                               target_volume_size=data_volume_size(cfg),
                               normalization=cfg.data.normalization)
    _, _, test = create_train_val_datasets(ds, cfg.data.train_split, cfg.data.val_split,
                                           split_mode=cfg.data.split_mode)
    if len(test) == 0:
        test = ds
    summary = engine.evaluate_dataset(test, out_json=args.output)
    print(json.dumps(summary, indent=2))


def cmd_diagnose(args):
    """Health-grade one reconstruction via the diagnostic-loss suite with
    live cross-attention capture (diagnostic_losses.py:534-636 interpretation
    surface, reachable from any checkpoint)."""
    from .config import data_volume_size
    from .data import PatientDRRDataset, SyntheticCTDataset
    from .inference import InferenceEngine

    engine = InferenceEngine(args.checkpoint)
    cfg = engine.cfg
    if args.synthetic or cfg.data.synthetic:
        ds = SyntheticCTDataset(num_patients=max(1, args.index + 1),
                                volume_size=data_volume_size(cfg), xray_size=cfg.data.xray_size)
    else:
        ds = PatientDRRDataset(args.data_path or cfg.data.dataset_path,
                               target_xray_size=cfg.data.xray_size,
                               target_volume_size=data_volume_size(cfg),
                               normalization=cfg.data.normalization)
    report = engine.diagnose(ds[args.index], max_stage=args.stage)
    text = json.dumps(report, indent=2)
    if args.output:
        Path(args.output).write_text(text)
    print(text)


def cmd_transfer(args):
    """Two-phase 128³→256³ transfer (ref: transfer_128_to_256_b200.py):
    shape-matched weight transfer from a 128³ checkpoint into the 256³ model,
    then training (optionally with the transferred subtrees frozen)."""
    import jax

    from .training import Trainer, shape_matched_transfer
    from .training.checkpoint import CheckpointManager

    cfg = _load_cfg(args)
    trainer = Trainer(cfg)
    variables = trainer.init_variables()

    mgr = CheckpointManager(str(__import__("pathlib").Path(args.from_checkpoint).parent))
    loaded, meta = mgr.restore(args.from_checkpoint, None)
    loaded_params = loaded.get("params", loaded) if isinstance(loaded, dict) else loaded
    new_params, transferred, skipped = shape_matched_transfer(variables["params"], loaded_params)
    print(f"transfer: {transferred} leaves transferred, {skipped} skipped "
          f"({transferred / max(transferred + skipped, 1) * 100:.1f}%)")
    variables = dict(variables)
    variables["params"] = new_params

    # persist the transferred init so training resumes from it
    trainer.ckpt.save({"params": new_params, "batch_stats": variables.get("batch_stats", {})},
                      epoch=-1, metrics={}, config=cfg.to_dict())
    if not args.init_only:
        metrics = trainer.fit(lr_override=args.lr, resume=True)
        print(json.dumps({"final": metrics}))


def cmd_export(args):
    from .inference import InferenceEngine

    engine = InferenceEngine(args.checkpoint)
    platforms = tuple(args.platforms.split(",")) if args.platforms else None
    info = engine.export_serving(args.output, batch_size=args.batch_size,
                                 max_stage=args.stage, platforms=platforms)
    print(json.dumps(info, indent=2))


def cmd_inspect(args):
    from .inference import inspect_checkpoint

    print(json.dumps(inspect_checkpoint(args.checkpoint), indent=2))


def cmd_bench(args):
    import bench as _bench_mod  # repo-root bench.py

    _bench_mod.main(["--skip-train"] if args.skip_train else [])


def cmd_dryrun(args):
    """Multi-chip rehearsal without the chips: virtual n-device CPU mesh,
    full sharded train steps + tensor-parallel attention check (the fake
    distributed backend the reference's mp.spawn/NCCL stack can't offer)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "__graft_entry__.py")
    if not os.path.exists(path):
        raise SystemExit("dryrun needs the repo checkout (__graft_entry__.py not found)")
    spec = importlib.util.spec_from_file_location("_dryrun_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(args.devices)


def main(argv=None):
    p = argparse.ArgumentParser(prog="hybrid_vit_cascade_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a model family")
    t.add_argument("--config", default=None)
    t.add_argument("--family", default=None)
    t.add_argument("--synthetic", action="store_true")
    t.add_argument("--epochs", type=int, default=None)
    t.add_argument("--lr", type=float, default=None, help="LR override on resume")
    t.add_argument("--save-dir", default=None)
    t.add_argument("--data-path", default=None)
    t.add_argument("--no-resume", action="store_true")
    t.add_argument("--profile-dir", default=None, help="write a jax.profiler trace of the first epoch")
    t.add_argument("--debug-nans", action="store_true")
    t.add_argument("--vgg-weights", default=None,
                   help="converted ImageNet VGG16 .npz (scripts/convert_vgg16.py) for the perceptual loss")
    t.add_argument("--viz-every", type=int, default=0,
                   help="write epoch-end feature/attention/prediction figures every N epochs")
    t.set_defaults(fn=cmd_train)

    i = sub.add_parser("infer", help="reconstruct + export NIfTI/PNG")
    i.add_argument("--checkpoint", required=True)
    i.add_argument("--output", default="inference_out")
    i.add_argument("--index", type=int, default=0)
    i.add_argument("--data-path", default=None)
    i.add_argument("--synthetic", action="store_true")
    i.add_argument("--upscale", default=None, help="D,H,W")
    i.add_argument("--denormalize", action="store_true", help="export in HU")
    i.add_argument("--pa-xray", default=None, help="raw AP X-ray image file (with --lat-xray)")
    i.add_argument("--lat-xray", default=None, help="raw lateral X-ray image file")
    i.set_defaults(fn=cmd_infer)

    e = sub.add_parser("eval", help="full-dataset metrics")
    e.add_argument("--checkpoint", required=True)
    e.add_argument("--output", default="evaluation_metrics.json")
    e.add_argument("--data-path", default=None)
    e.add_argument("--synthetic", action="store_true")
    e.set_defaults(fn=cmd_eval)

    dg = sub.add_parser("diagnose", help="diagnostic-loss suite + health grades on one sample")
    dg.add_argument("--checkpoint", required=True)
    dg.add_argument("--index", type=int, default=0)
    dg.add_argument("--stage", type=int, default=1, help="cascade max_stage for the graded forward")
    dg.add_argument("--synthetic", action="store_true")
    dg.add_argument("--data-path", default=None)
    dg.add_argument("--output", default=None, help="optional JSON path")
    dg.set_defaults(fn=cmd_diagnose)

    x = sub.add_parser("transfer", help="shape-matched weight transfer (e.g. 128³→256³) then train")
    x.add_argument("--from-checkpoint", required=True, help="source checkpoint dir")
    x.add_argument("--config", default=None)
    x.add_argument("--family", default=None)
    x.add_argument("--synthetic", action="store_true")
    x.add_argument("--epochs", type=int, default=None)
    x.add_argument("--lr", type=float, default=None)
    x.add_argument("--save-dir", default=None)
    x.add_argument("--data-path", default=None)
    x.add_argument("--init-only", action="store_true", help="only write the transferred init")
    x.set_defaults(fn=cmd_transfer)

    n = sub.add_parser("inspect", help="dump checkpoint keys/shapes")
    n.add_argument("--checkpoint", required=True)
    n.set_defaults(fn=cmd_inspect)

    ex = sub.add_parser("export", help="serialize checkpoint+model into one StableHLO serving artifact")
    ex.add_argument("--checkpoint", required=True)
    ex.add_argument("--output", required=True, help="artifact path (e.g. model.stablehlo)")
    ex.add_argument("--batch-size", type=int, default=1)
    ex.add_argument("--stage", type=int, default=3, help="cascade max_stage to export")
    ex.add_argument("--platforms", default=None,
                    help="comma-separated lowering targets, e.g. tpu,cpu (default: current backend)")
    ex.set_defaults(fn=cmd_export)

    b = sub.add_parser("bench", help="run the throughput benchmark")
    b.add_argument("--skip-train", action="store_true",
                   help="inference metric only (skip the training phases)")
    b.set_defaults(fn=cmd_bench)

    dr = sub.add_parser("dryrun", help="multi-chip sharding rehearsal on a virtual CPU mesh")
    dr.add_argument("--devices", type=int, default=8)
    dr.set_defaults(fn=cmd_dryrun)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
