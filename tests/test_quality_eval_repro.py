"""Eval-reproduction guard (round-4 VERDICT item 3b): the committed quality
artifacts must be VERIFIABLE, not just parseable. docs/quality_r5 commits the
stage-2 best checkpoint of the recorded run (stage3 subtree pruned for size)
plus eval_repro.json — per-sample metrics for the first test phantoms,
computed on CPU by scripts/finalize_quality_r5.py step 4. This test repeats
that exact computation through the product surfaces (InferenceEngine →
seeded synthetic test split → evaluate_sample) and asserts agreement, so a
code change that alters the model math, the dataset seeding/splits, or the
metric definitions now FAILS against the committed artifact instead of
silently diverging from it (the r4 guard only parsed a committed JSON).

Reference analog: the acceptance-gate idea in
direct_regression/start_direct_training.sh:16-21.
"""

import json
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # 128³ cascade forward on CPU

DOCS = Path(__file__).resolve().parent.parent / "docs" / "quality_r5"
ARTIFACT = DOCS / "ckpt_stage2_best"
EXPECT = DOCS / "eval_repro.json"


@pytest.mark.skipif(not (ARTIFACT.exists() and EXPECT.exists()),
                    reason="quality_r5 eval-repro artifacts not present")
def test_committed_checkpoint_reproduces_recorded_eval():
    from hybrid_vit_cascade_tpu.config import data_volume_size
    from hybrid_vit_cascade_tpu.data import SyntheticCTDataset, create_train_val_datasets
    from hybrid_vit_cascade_tpu.inference import InferenceEngine

    spec = json.loads(EXPECT.read_text())
    eng = InferenceEngine(str(ARTIFACT), max_stage=spec["max_stage"])
    cfg = eng.cfg
    ds = SyntheticCTDataset(num_patients=cfg.data.synthetic_patients,
                            volume_size=data_volume_size(cfg),
                            xray_size=cfg.data.xray_size)
    _, _, test = create_train_val_datasets(ds, cfg.data.train_split, cfg.data.val_split,
                                           split_mode=cfg.data.split_mode)
    assert len(test) >= spec["n"], "seeded test split shrank — split contract changed"
    for i, expect in enumerate(spec["rows"][: spec["n"]]):
        got = eng.evaluate_sample(test[i], max_stage=spec["max_stage"])
        for key, want in expect.items():
            have = got[key]
            tol = 0.05 if key.endswith("_psnr") else 0.005
            assert have == pytest.approx(want, abs=tol), (
                f"sample {i} {key}: recorded {want} vs recomputed {have} — the "
                f"committed quality artifact no longer matches the code")
