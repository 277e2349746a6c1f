"""Finalize the round-5 quality run into committed, VERIFIABLE artifacts.

Four steps (round-4 VERDICT items 2 + 3b):
  1. summarize runs/quality_r5 → docs/quality_r5/{summary.json, curves_*.png,
     training_log.csv}
  2. full-cascade test-set eval from the stage-3 best checkpoint (256³
     targets — the `hvc eval` path) → docs/quality_r5/evaluation_metrics.json
     and the repo-root evaluation_metrics.json
  3. prune the stage-2 best checkpoint (drop the stage3 subtree) →
     docs/quality_r5/ckpt_stage2_best — a committed artifact small enough to
     live in git whose metrics a test can REPRODUCE, not just parse
  4. re-evaluate the pruned artifact on CPU over the first N test phantoms
     (the exact computation tests/test_quality_eval_repro.py repeats) →
     docs/quality_r5/eval_repro.json

Run on the TPU host after `hvc train --config configs/quality_r5.json`
completes:  python scripts/finalize_quality_r5.py
"""

import json
import shutil
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
RUN = REPO / "runs" / "quality_r5"
DOCS = REPO / "docs" / "quality_r5"
N_REPRO = 2  # test phantoms re-evaluated by the in-suite reproduction test


def step1_summary():
    DOCS.mkdir(parents=True, exist_ok=True)
    out = subprocess.run([sys.executable, "scripts/summarize_quality_run.py", str(RUN)],
                         cwd=REPO, capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.strip().startswith("{")][-1]
    summary = json.loads(line)
    (DOCS / "summary.json").write_text(json.dumps(summary))
    shutil.copy(RUN / "training_log.csv", DOCS / "training_log.csv")
    for png in RUN.glob("curves_*.png"):
        shutil.copy(png, DOCS / png.name)
    print("summary:", json.dumps(summary)[:400])
    return summary


def step2_eval():
    out = DOCS / "evaluation_metrics.json"
    subprocess.run([sys.executable, "-m", "hybrid_vit_cascade_tpu.cli", "eval",
                    "--checkpoint", str(RUN / "stage3" / "best_psnr"),
                    "--output", str(out)], cwd=REPO, check=True)
    payload = json.loads(out.read_text())
    root = {"run": "runs/quality_r5", "n": len(payload["per_sample"]),
            "summary": payload["summary"]}
    (REPO / "evaluation_metrics.json").write_text(json.dumps(root, indent=1))
    print("eval summary:", {k: round(v["mean"], 3) for k, v in payload["summary"].items()})


def step3_prune():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from hybrid_vit_cascade_tpu.training.checkpoint import CheckpointManager

    src = RUN / "stage2" / "best_psnr"
    mgr = CheckpointManager(str(src.parent))
    loaded, meta = mgr.restore(str(src), None)
    params = {k: v for k, v in loaded["params"].items() if k != "stage3"}
    bs = {k: v for k, v in loaded.get("batch_stats", {}).items() if k != "stage3"}
    dst_root = DOCS
    if (dst_root / "ckpt_stage2_best").exists():
        shutil.rmtree(dst_root / "ckpt_stage2_best")
    out_mgr = CheckpointManager(str(dst_root), save_every=0, keep_best=[])
    out_mgr._write("ckpt_stage2_best", {"params": params, "batch_stats": bs}, meta)
    size = sum(f.stat().st_size for f in (dst_root / "ckpt_stage2_best").rglob("*") if f.is_file())
    print(f"pruned artifact: {size / 1e6:.0f} MB at {dst_root / 'ckpt_stage2_best'}")


def step4_repro_expectations():
    """CPU re-eval of the pruned artifact — the exact numbers the slow-tier
    test asserts (CPU-to-CPU comparison: deterministic, no TPU needed)."""
    env = dict(__import__("os").environ)
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import json
from hybrid_vit_cascade_tpu.inference import InferenceEngine
from hybrid_vit_cascade_tpu.data import SyntheticCTDataset, create_train_val_datasets
from hybrid_vit_cascade_tpu.config import data_volume_size

eng = InferenceEngine(r"{DOCS / 'ckpt_stage2_best'}", max_stage=2)
cfg = eng.cfg
ds = SyntheticCTDataset(num_patients=cfg.data.synthetic_patients,
                        volume_size=data_volume_size(cfg), xray_size=cfg.data.xray_size)
_, _, test = create_train_val_datasets(ds, cfg.data.train_split, cfg.data.val_split,
                                       split_mode=cfg.data.split_mode)
rows = [eng.evaluate_sample(test[i], max_stage=2) for i in range({N_REPRO})]
print("REPRO " + json.dumps(rows))
"""
    out = subprocess.run([sys.executable, "-c", code], cwd=REPO, env=env,
                         capture_output=True, text=True, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("REPRO ")][-1]
    rows = json.loads(line[len("REPRO "):])
    (DOCS / "eval_repro.json").write_text(json.dumps(
        {"checkpoint": "docs/quality_r5/ckpt_stage2_best", "n": N_REPRO,
         "max_stage": 2, "platform": "cpu", "rows": rows}, indent=1))
    print("repro rows:", rows)


if __name__ == "__main__":
    steps = sys.argv[1:] or ["1", "2", "3", "4"]
    if "1" in steps:
        step1_summary()
    if "2" in steps:
        step2_eval()
    if "3" in steps:
        step3_prune()
    if "4" in steps:
        step4_repro_expectations()
