"""Model summaries (ref: progressive_cascade/utils.py:11-48)."""

from __future__ import annotations

import jax
import numpy as np


def count_parameters(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree.leaves(params)))


def print_model_summary(name: str, params) -> str:
    total = count_parameters(params)
    lines = [f"=== {name} ===", f"Total parameters: {total:,}",
             f"Model size (fp32): {total * 4 / 1024**2:.2f} MB"]
    for top, sub in (params.items() if isinstance(params, dict) else []):
        lines.append(f"  {top}: {count_parameters(sub):,}")
    text = "\n".join(lines)
    print(text)
    return text
