"""Pallas TPU kernels — the native equivalents of the reference's cuDNN hot
paths (SURVEY.md §7 kernel targets)."""

from .flash_attention import flash_attention

__all__ = ["flash_attention"]
