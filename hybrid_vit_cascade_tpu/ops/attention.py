"""Multi-head attention core: jnp reference path + Pallas flash path.

The reference materializes full (Nq, Nk) score matrices
(models/vit_components.py:46-51,103-113). At stage 3 the voxel-token count is
32,768 — a 32768² fp32 score map is 4.3 GB per (batch, head), which is why the
TPU build streams K/V blockwise instead (Pallas flash attention,
ops/pallas/flash_attention.py). The jnp path here is the numerical reference
(exact softmax, fp32 accumulation) used for small token counts and for golden
tests of the kernel.

Shapes: q (B, H, Nq, Dh), k/v (B, H, Nk, Dh) → (B, H, Nq, Dh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# Token-count threshold above which the Pallas kernel is preferred on TPU.
_FLASH_MIN_TOKENS = 2048

# Trace-time dispatch record: which path each dot_product_attention call took
# ('flash' | 'head' | 'seq' | 'xla'). Appended during TRACING only (jit caches
# mean steady-state calls don't re-record) — used by the multi-chip dryrun and
# tests to pin the production graph's attention paths.
_dispatch_log: list = []
_warned_flash_fallback = False


def _log_dispatch(path: str, q) -> None:
    _dispatch_log.append(
        {"path": path, "B": int(q.shape[0]), "H": int(q.shape[1]),
         "Nq": int(q.shape[2])})


def dispatch_log(clear: bool = False) -> list:
    """Snapshot (and optionally reset) the trace-time dispatch record."""
    out = list(_dispatch_log)
    if clear:
        _dispatch_log.clear()
    return out


def _head_sharded_flash(q, k, v, scale, mesh):
    """Tensor-parallel flash attention: shard the HEAD axis over the mesh's
    'model' axis and run the Pallas kernel per-device under shard_map.

    Attention is independent per (batch, head), so head sharding needs NO
    collectives inside the map — each device streams K/V blocks for its own
    heads entirely in VMEM. This is the multi-chip replacement for the
    reference's single-GPU materialized score map (vit_components.py:46-51):
    without it, a model-axis mesh had to fall back to XLA attention, whose
    (B, H, Nq, Nk) score tensor is 4.3 GB per (batch, head) at the stage-3
    token count — un-shardable into HBM once Pallas is off the table.

    The batch axis rides the 'data' axis (DP), so the kernel sees
    (B/dp, H/mp, N, d) locally. Differentiation flows through the kernel's
    custom VJP per shard (no cross-shard terms exist).
    """
    from .pallas.flash_attention import flash_attention

    spec = P("data", "model", None, None)

    def local(qs, ks, vs):
        return flash_attention(qs, ks, vs, scale=scale)

    return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                         out_specs=spec, check_vma=False)(q, k, v)


def _head_shardable(q, mesh) -> bool:
    """True when (B, H) divide the (data, model) mesh axes evenly."""
    if mesh is None:
        return False
    shape = dict(mesh.shape)
    dp, mp = shape.get("data", 1), shape.get("model", 1)
    B, H = q.shape[0], q.shape[1]
    return mp > 1 and H % mp == 0 and B % dp == 0


def _seq_sharded_flash(q, k, v, scale, mesh):
    """Sequence-parallel flash attention: shard the QUERY-token axis over the
    'model' axis, replicate K/V, and run the Pallas kernel per-device under
    shard_map. Each q row's softmax spans the full K/V, so shards are
    independent — no collectives inside the map; the K/V all-gather (forward)
    and dk/dv psum (backward transpose of the replicated in_spec) are
    inserted by shard_map itself.

    Used when the head count doesn't divide the model axis (mp > H or odd H),
    where head sharding can't apply; memory per device is O(Nq/mp · d) for
    the streamed scores — the XLA fallback would materialize
    (B, H, Nq/mp, Nk) score tensors instead."""
    from .pallas.flash_attention import flash_attention

    qspec = P("data", None, "model", None)
    kvspec = P("data", None, None, None)

    def local(qs, ks, vs):
        return flash_attention(qs, ks, vs, scale=scale)

    return jax.shard_map(local, mesh=mesh, in_specs=(qspec, kvspec, kvspec),
                         out_specs=qspec, check_vma=False)(q, k, v)


def _seq_shardable(q, mesh) -> bool:
    """True when (B, Nq) divide the (data, model) mesh axes evenly."""
    if mesh is None:
        return False
    shape = dict(mesh.shape)
    dp, mp = shape.get("data", 1), shape.get("model", 1)
    B, Nq = q.shape[0], q.shape[2]
    return mp > 1 and Nq % mp == 0 and B % dp == 0


def _sharded_dispatch(q, mesh) -> str | None:
    """Which flash sharding applies under a model>1 mesh: 'head' (tensor
    parallelism — preferred, zero collectives inside the map) | 'seq'
    (query-sequence parallelism — K/V all-gathered by shard_map) | None
    (neither axis divides; callers must fall back to XLA attention, which
    GSPMD *can* partition, because pallas_call is opaque to the partitioner).

    Pure trace-time shape logic, unit-tested off-TPU (tests/test_flash_sharded)
    since the on-TPU 'auto' route through it can't run on the CPU harness."""
    if _head_shardable(q, mesh):
        return "head"
    if _seq_shardable(q, mesh):
        return "seq"
    return None


def _reference_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                         return_probs: bool = False):
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v, preferred_element_type=jnp.float32)
    out = out.astype(q.dtype)
    return (out, probs) if return_probs else out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    impl: str = "auto",
    return_probs: bool = False,
):
    """Softmax attention. impl: 'auto' | 'flash' | 'flash_sharded' | 'xla'.

    'auto' uses the Pallas flash kernel on TPU backends once the score matrix
    is big enough to be memory-bound, otherwise plain XLA. Under an ambient
    mesh with model>1 the kernel runs HEAD-SHARDED via shard_map (tensor
    parallelism — see _head_sharded_flash), or QUERY-SEQUENCE-SHARDED when
    the head count doesn't divide the mesh (_seq_sharded_flash); only if
    neither divides does 'auto' fall back to XLA. 'flash_sharded' forces the
    sharded paths (tests).

    return_probs=True additionally returns the fp32 attention probabilities
    (B, H, Nq, Nk) — the reference's `store_attention` diagnostic capture
    (vit_components.py:63-108). Forces the XLA path (a streamed kernel never
    materializes the score map), so restrict to small token counts.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5

    from ..parallel import ambient_mesh, model_axis_size

    use_flash = False
    if impl == "flash_sharded":
        if return_probs:
            raise ValueError(
                "return_probs=True is incompatible with impl='flash_sharded': "
                "a streamed sharded kernel never materializes the (Nq, Nk) "
                "probability map. Use impl='xla' (small token counts only).")
        mesh = ambient_mesh()
        path = _sharded_dispatch(q, mesh)
        if path is None:
            raise ValueError(
                f"flash_sharded needs an ambient (data, model) mesh dividing "
                f"(B={q.shape[0]}, H={q.shape[1]}) or (B, Nq={q.shape[2]}); "
                f"mesh={mesh}")
        fn = _head_sharded_flash if path == "head" else _seq_sharded_flash
        _log_dispatch(path, q)
        return fn(q, k, v, scale, mesh)
    if impl == "flash":
        use_flash = True
    elif impl == "auto":
        on_tpu = jax.default_backend() not in ("cpu", "gpu")
        use_flash = on_tpu and (q.shape[-2] * k.shape[-2] >= _FLASH_MIN_TOKENS ** 2)

    if use_flash and not return_probs:
        if model_axis_size() > 1:
            mesh = ambient_mesh()
            path = _sharded_dispatch(q, mesh)
            if path == "head":
                _log_dispatch("head", q)
                return _head_sharded_flash(q, k, v, scale, mesh)
            if path == "seq":
                _log_dispatch("seq", q)
                return _seq_sharded_flash(q, k, v, scale, mesh)
            # pallas_call is opaque to the XLA partitioner: with a model
            # axis the kernel can't be split by GSPMD, so route through
            # XLA (sequence-sharded tokens, K/V all-gather inserted).
            # Applies to forced impl='flash' too — an unsharded pallas_call
            # under a model-axis mesh would be silently un-partitionable.
            if impl == "flash":
                # an explicit user request is being degraded (different
                # numerics + memory profile) — say so, once
                global _warned_flash_fallback
                if not _warned_flash_fallback:
                    _warned_flash_fallback = True
                    import warnings

                    warnings.warn(
                        "impl='flash' requested under a model>1 mesh with no "
                        "shardable (head/seq) axis; routing through the exact "
                        "XLA path instead (numerics and memory profile differ).",
                        stacklevel=2)
            _log_dispatch("xla", q)
            return _reference_attention(q, k, v, scale)
        from .pallas.flash_attention import flash_attention

        _log_dispatch("flash", q)
        return flash_attention(q, k, v, scale=scale)
    _log_dispatch("xla", q)
    return _reference_attention(q, k, v, scale, return_probs=return_probs)
