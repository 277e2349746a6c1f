"""Optional wandb logging (reference: utils/visualization.py:12-18 guards
every wandb call behind an import check; same contract here). If wandb is not
installed or disabled, every function is a silent no-op."""

from __future__ import annotations

from typing import Dict, Optional

try:
    import wandb  # noqa: F401

    WANDB_AVAILABLE = True
except ImportError:
    WANDB_AVAILABLE = False
    wandb = None

_active = False


def init(project: str = "hybrid-vit-cascade-tpu", config: Optional[dict] = None, **kwargs) -> bool:
    global _active
    if not WANDB_AVAILABLE:
        return False
    wandb.init(project=project, config=config or {}, **kwargs)
    _active = True
    return True


def log(metrics: Dict, step: Optional[int] = None) -> None:
    if _active and WANDB_AVAILABLE:
        wandb.log(metrics, step=step)


def log_images(images: Dict[str, str], step: Optional[int] = None) -> None:
    """Log saved figure files as wandb Images ({key: png_path}); silent no-op
    when wandb is absent/inactive (reference: the wandb.Image branches of
    visualize_epoch_features, utils/visualization.py:315-321)."""
    if _active and WANDB_AVAILABLE:
        wandb.log({k: wandb.Image(path) for k, path in images.items()}, step=step)


def finish() -> None:
    global _active
    if _active and WANDB_AVAILABLE:
        wandb.finish()
        _active = False
