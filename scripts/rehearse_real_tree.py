"""Real-data-format dress rehearsal, end to end on the chip.

Builds a tiny REFERENCE-FORMAT patient tree on disk (PNG DRR pairs +
.nii.gz HU volumes via the repo's own writer — the exact contract of
/root/reference/utils/dataset.py:94-159,199-229), then drives the full
product loop against it with the real `hvc` surfaces:

    train (direct_vit 64³, short schedule)  → folder discovery, native C++
        NIfTI decode, HU soft-tissue window, host pre-resize, prefetched
        loader, checkpoints
    eval                                    → full-dataset metric summary
    infer (dataset sample + raw PNG pair)   → reconstruction + NIfTI/PNG/
        metrics export, preset-range raw-image normalization

The first real dataset this framework meets must not be the first time that
path runs end-to-end (round-4 VERDICT item 4). The discovery→decode→batch
contract is also unit-covered by tests/test_data.py::TestReferenceTreeRehearsal;
this script is the on-chip integration pass, writing a JSON summary to
docs/rehearsal_real_tree.json.

Usage:  python scripts/rehearse_real_tree.py [--patients 6] [--epochs 8]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run(cmd, **kw):
    print(f"$ {' '.join(map(str, cmd))}", flush=True)
    t0 = time.time()
    res = subprocess.run([str(c) for c in cmd], cwd=REPO, capture_output=True, text=True, **kw)
    dt = time.time() - t0
    tail = "\n".join((res.stdout + res.stderr).strip().splitlines()[-8:])
    print(tail, flush=True)
    if res.returncode != 0:
        raise SystemExit(f"command failed rc={res.returncode} after {dt:.0f}s")
    return res.stdout, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--patients", type=int, default=6)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--root", default=str(REPO / "runs" / "real_tree"))
    args = ap.parse_args()

    root = Path(args.root)
    tree = root / "data"
    ckpt = root / "ckpt"
    out = {"patients": args.patients, "epochs": args.epochs}

    # 1. materialize the reference-format tree (256-base phantoms so the HU
    #    decode + window + resize path does real work)
    sys.path.insert(0, str(REPO))
    from hybrid_vit_cascade_tpu.data.synthetic import write_reference_tree

    t0 = time.time()
    pids = write_reference_tree(tree, num_patients=args.patients, base_size=256, xray_size=512)
    out["tree_seconds"] = round(time.time() - t0, 1)
    out["tree"] = {"root": str(tree), "patients": pids}

    # 2. config: direct 64³ on the REAL dataset path (synthetic=false)
    from hybrid_vit_cascade_tpu.config import Config

    cfg = Config.from_json(str(REPO / "configs" / "direct_64.json"))
    cfg.data.synthetic = False
    cfg.data.dataset_path = str(tree)
    cfg.data.train_split = 0.7
    cfg.data.val_split = 0.15
    cfg.training.num_epochs = args.epochs
    cfg.training.batch_size = 2
    cfg.checkpoints.save_dir = str(ckpt)
    cfg.checkpoints.save_every = 0
    cfg_path = root / "rehearsal_config.json"
    root.mkdir(parents=True, exist_ok=True)
    cfg.to_json(str(cfg_path))

    cli = [sys.executable, "-m", "hybrid_vit_cascade_tpu.cli"]
    _, out["train_seconds"] = run(cli + ["train", "--config", cfg_path])

    # 3. eval: full-dataset per-sample metrics off the best checkpoint
    best = ckpt / "best_psnr"
    ev_json = root / "evaluation_metrics.json"
    _, out["eval_seconds"] = run(
        cli + ["eval", "--checkpoint", best, "--data-path", tree, "--output", ev_json])
    ev = json.loads(ev_json.read_text())
    out["eval"] = ev.get("summary", ev)

    # 4. infer: dataset sample export AND the raw PNG pair surface
    _, out["infer_seconds"] = run(
        cli + ["infer", "--checkpoint", best, "--data-path", tree,
               "--output", root / "infer"])
    p0 = tree / pids[0]
    _, out["infer_raw_seconds"] = run(
        cli + ["infer", "--checkpoint", best,
               "--pa-xray", p0 / f"{pids[0]}_pa_drr.png",
               "--lat-xray", p0 / f"{pids[0]}_lat_drr.png",
               "--output", root / "infer_raw"])

    exported = sorted(p.name for p in (root / "infer").glob("*")) + \
               sorted("raw/" + p.name for p in (root / "infer_raw").glob("*"))
    out["exports"] = exported
    dest = REPO / "docs" / "rehearsal_real_tree.json"
    dest.write_text(json.dumps(out, indent=2))
    print(f"rehearsal OK → {dest}", flush=True)


if __name__ == "__main__":
    main()
