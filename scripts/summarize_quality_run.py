"""Summarize a cascade quality run: per-stage PSNR/SSIM trajectories + best
metrics from the trainer's JSONL log, compared against the reference's honest
measured baselines (BASELINE.md), plus training-curve plots.

Usage: python scripts/summarize_quality_run.py [run_dir]
Defaults to runs/quality_r3. Prints one JSON summary line and writes
{run_dir}/curves_{stage}.png.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Reference honest measured baselines (BASELINE.md "Measured" table) — real
# CT data, so synthetic-phantom numbers are a schedule rehearsal, not a
# like-for-like comparison; the trajectory/schedule completeness is the point.
REFERENCE_MEASURED = {
    "stage1": {"psnr": 27.13, "epochs": 100},
    "stage2": {"psnr": 27.63, "ssim": 0.4975, "epochs": 20},
}


def main() -> None:
    run_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "runs/quality_r3")
    log = run_dir / "training_log.jsonl"
    rows = [json.loads(l) for l in log.read_text().splitlines() if l.strip()]
    stages = {}
    for r in rows:
        if "train_loss" not in r:  # viz-hook rows carry no epoch metrics
            continue
        ph = r.get("phase", "train")
        s = stages.setdefault(ph, {"epochs": 0, "best_psnr": 0.0, "best_ssim": 0.0,
                                   "final_psnr": 0.0, "final_ssim": 0.0,
                                   "seconds": 0.0})
        s["epochs"] += 1
        if "psnr" in r:
            s["best_psnr"] = max(s["best_psnr"], r["psnr"])
            s["final_psnr"] = r["psnr"]
        if "ssim" in r:
            s["best_ssim"] = max(s["best_ssim"], r["ssim"])
            s["final_ssim"] = r["ssim"]
        s["seconds"] += r.get("seconds", 0.0)

    # per-stage curve plots (utils.viz on the filtered log)
    try:
        from hybrid_vit_cascade_tpu.utils.viz import plot_training_curves

        for ph in stages:
            sub = run_dir / f"_log_{ph}.jsonl"
            sub.write_text("\n".join(json.dumps(r) for r in rows if r.get("phase") == ph))
            plot_training_curves(str(sub), str(run_dir / f"curves_{ph}.png"))
            sub.unlink()
    except Exception as exc:  # plotting is best-effort
        print(f"plotting skipped: {exc}", file=sys.stderr)

    total_s = sum(s["seconds"] for s in stages.values())
    print(json.dumps({"run_dir": str(run_dir), "stages": stages,
                      "total_hours": round(total_s / 3600.0, 2),
                      "reference_measured": REFERENCE_MEASURED}))


if __name__ == "__main__":
    main()
