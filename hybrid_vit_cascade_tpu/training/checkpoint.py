"""Orbax checkpointing with the reference's checkpoint patterns (SURVEY §5):

  (a) triple best-checkpoints by loss/PSNR/SSIM (train_direct256_h200.py:248-305)
  (b) periodic epoch checkpoints (train_direct_4gpu.py:289-298)
  (c) partial/filtered restore by key prefix (train_progressive_1gpu.py:211-225)
      and shape-matched cross-architecture transfer
      (model_direct256_b200.py:255-298)
  (d) resume with LR override (resume_direct128.py:230-243) — handled by
      rebuilding the optimizer in the Trainer after restore
  (e) config embedded in the checkpoint (inference_direct.py:27-46)
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _flatten(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, prefix + (k,))
    else:
        yield prefix, tree


class CheckpointManager:
    """Directory layout: save_dir/{latest, best_loss, best_psnr, best_ssim,
    epoch_%04d}/ each holding an Orbax pytree + meta.json."""

    def __init__(self, save_dir: str, save_every: int = 10, keep_best: Sequence[str] = ("loss", "psnr", "ssim")):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.save_every = save_every
        self.keep_best = tuple(keep_best)
        self._ckptr = ocp.StandardCheckpointer()
        self._best: Dict[str, float] = {}
        self._load_best_records()

    def _load_best_records(self):
        f = self.save_dir / "best_records.json"
        if f.exists():
            self._best = json.loads(f.read_text())

    def _save_best_records(self):
        (self.save_dir / "best_records.json").write_text(json.dumps(self._best, indent=2))

    def _barrier(self, tag: str):
        """Cross-process sync point. Orbax's save is a COLLECTIVE (it runs
        sync_global_devices barriers internally), so every process must call
        it; the raw filesystem bookkeeping around it (tmp-dir dance, rename,
        meta.json) stays process-0-only and must be fenced so no process
        races the rename. Caught by scripts/rehearse_multihost.py — a
        process-0-only early return desyncs the save_start barrier."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            self._seq = getattr(self, "_seq", 0) + 1
            multihost_utils.sync_global_devices(f"ckpt_{tag}_{self._seq}")

    def _write(self, name: str, pytree, meta: Dict[str, Any]):
        path = (self.save_dir / name).absolute()
        tmp = path.with_suffix(".tmp")
        p0 = jax.process_index() == 0
        if p0 and tmp.exists():
            shutil.rmtree(tmp)
        self._barrier("pre")  # tmp cleared before any process's save starts
        self._ckptr.save(tmp, pytree)
        self._ckptr.wait_until_finished()
        self._barrier("post")  # all shards durable before the rename
        if p0:
            if path.exists():
                shutil.rmtree(path)
            tmp.rename(path)
            (path / "meta.json").write_text(json.dumps(meta, indent=2, default=float))
        self._barrier("renamed")  # 'latest' visible before anyone proceeds

    def save(self, pytree, epoch: int, metrics: Dict[str, float], config: Optional[dict] = None,
             opt: Optional[Any] = None) -> Dict[str, bool]:
        """Save 'latest' (+ periodic) and update best-by-metric checkpoints.
        metrics: {'loss': val_loss, 'psnr': ..., 'ssim': ...}. Returns which
        best tags were improved.

        `opt` (optimizer state + step) is stored as a sibling item
        'latest_opt', kept out of the model tree so inference/transfer
        templates stay unchanged — the reference's checkpoint format keeps
        optimizer_state_dict alongside model_state_dict for resume
        (resume_direct128.py:87-88,231-243).

        Multi-process: ALL processes must call save (the Orbax write is a
        collective); the best-tag decisions are deterministic and identical
        on every process (metrics come from a psum'd eval), while the
        filesystem bookkeeping is process-0-only inside _write."""
        meta = {"epoch": epoch, "metrics": metrics, "config": config or {}}
        self._write("latest", pytree, meta)
        if opt is not None:
            self._write("latest_opt", opt, meta)
        if self.save_every and (epoch + 1) % self.save_every == 0:
            self._write(f"epoch_{epoch:04d}", pytree, meta)
        improved = {}
        for tag in self.keep_best:
            if tag not in metrics:
                continue
            val = float(metrics[tag])
            better = (val < self._best.get(tag, np.inf)) if tag == "loss" else (val > self._best.get(tag, -np.inf))
            if better:
                self._best[tag] = val
                self._write(f"best_{tag}", pytree, meta)
                improved[tag] = True
        if jax.process_index() == 0:
            self._save_best_records()
        return improved

    # --- restore ----------------------------------------------------------
    def restore(self, name_or_path: str, template) -> Tuple[Any, Dict]:
        path = Path(name_or_path)
        if not path.exists():
            path = self.save_dir / name_or_path
        restored = self._ckptr.restore(path.absolute(), template)
        meta = {}
        mf = path / "meta.json"
        if mf.exists():
            meta = json.loads(mf.read_text())
        return restored, meta

    def restore_latest(self, template) -> Optional[Tuple[Any, Dict]]:
        if not (self.save_dir / "latest").exists():
            return None
        return self.restore("latest", template)

    def restore_opt(self, template) -> Optional[Any]:
        """Restore the optimizer-state sibling of 'latest' (None when the
        checkpoint predates opt-state saving or structure mismatches, e.g.
        after an optimizer-config change — resume then proceeds with fresh
        optimizer state, the pre-fix behavior)."""
        if not (self.save_dir / "latest_opt").exists():
            return None
        try:
            restored, _ = self.restore("latest_opt", template)
            return restored
        except Exception:
            return None


def filtered_restore(params: Dict, loaded: Dict, include_prefixes: Sequence[str]) -> Dict:
    """Overwrite only subtrees whose top-level key starts with a prefix —
    the reference's key-prefix filtered load
    (train_progressive_1gpu.py:211-225, train_stage2_extended.py:190-198)."""
    out = dict(params)
    for key in params:
        if any(key.startswith(p) for p in include_prefixes) and key in loaded:
            out[key] = loaded[key]
    return out


def shape_matched_transfer(params, loaded) -> Tuple[Any, int, int]:
    """Copy every leaf whose path exists in both trees with identical shape
    (Direct256Model_B200.load_pretrained_128, model_direct256_b200.py:262-298).
    Returns (new_params, transferred, skipped)."""
    loaded_leaves = {path: leaf for path, leaf in _flatten(loaded)}
    transferred = 0
    skipped = 0

    def visit(path, leaf):
        nonlocal transferred, skipped
        cand = loaded_leaves.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            transferred += 1
            return jax.numpy.asarray(cand, leaf.dtype) if hasattr(leaf, "dtype") else cand
        skipped += 1
        return leaf

    def walk(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: walk(v, prefix + (k,)) for k, v in tree.items()}
        return visit(prefix, tree)

    return walk(params), transferred, skipped
