"""Optimizers, LR schedules, stage freezing.

AdamW + cosine annealing + global-norm clip reproduces every reference
trainer's recipe (train_direct_4gpu.py:160-171 etc.). Stage freezing —
`model.freeze_stage(n)` + filtering `requires_grad` params in the reference
(model_progressive.py:404-432, train_progressive_1gpu.py:246-250) — becomes
an optax.multi_transform mask over parameter subtrees: frozen subtrees get
set_to_zero(), so the model stays a pure function.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import optax


def make_optimizer(
    learning_rate: float,
    total_steps: int,
    weight_decay: float = 0.01,
    gradient_clip: float = 1.0,
    warmup_steps: int = 0,
    trainable_prefixes: Optional[Sequence[str]] = None,
    params=None,
) -> optax.GradientTransformation:
    """AdamW + cosine decay to ~0 over total_steps (+ optional warmup) with
    global-norm clipping; optionally train only subtrees whose top-level key
    starts with one of trainable_prefixes."""
    if warmup_steps > 0:
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=learning_rate, warmup_steps=warmup_steps,
            decay_steps=max(total_steps, warmup_steps + 1),
        )
    else:
        schedule = optax.cosine_decay_schedule(init_value=learning_rate, decay_steps=max(total_steps, 1))
    base = optax.chain(
        optax.clip_by_global_norm(gradient_clip),
        optax.adamw(schedule, weight_decay=weight_decay),
    )
    if trainable_prefixes is None:
        return base
    assert params is not None, "params required to build the freeze mask"
    labels = stage_freeze_labels(params, trainable_prefixes)
    return optax.multi_transform({"train": base, "freeze": optax.set_to_zero()}, labels)


def stage_freeze_labels(params, trainable_prefixes: Sequence[str]):
    """Label each top-level param subtree 'train'/'freeze' by name prefix
    (the functional equivalent of freeze_stage / requires_grad filtering)."""

    def label_tree(name, subtree):
        lab = "train" if any(name.startswith(p) for p in trainable_prefixes) else "freeze"
        return jax.tree.map(lambda _: lab, subtree)

    return {name: label_tree(name, sub) for name, sub in params.items()}
