"""Checkpoint-driven inference + exports.

Mirrors the reference's inference surface: config recovered from the
checkpoint (inference_direct.py:27-46), per-stage outputs + metrics
(inference_progressive.py:50-91), NIfTI + orthogonal-view PNG export with
optional trilinear upscale (inference_direct128.py:114-192), and
HU denormalization (inference_visualization.py:173-189).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..losses import mae, psnr, psnr_dynamic_range, ssim_metric
from ..ops.resize import resize_trilinear
from ..training.checkpoint import CheckpointManager
from ..training.trainer import build_model, resize_target


def denormalize_ct(volume: np.ndarray, normalization: str = "soft_tissue") -> np.ndarray:
    """normalized volume → HU (inverse of the dataset presets)."""
    if normalization == "soft_tissue":  # [-1,1] → [-200,200]
        return volume * 200.0
    if normalization == "full":  # [0,1] → [-1024,3071]
        return volume * 4095.0 - 1024.0
    raise ValueError(normalization)


def load_xray_pair(pa_path: str, lat_path: str, size: int = 512,
                   normalize_range: Tuple[float, float] = (0.0, 1.0)) -> np.ndarray:
    """Load a raw AP/lateral X-ray image pair straight from files — no
    dataset folder needed (inference_visualization.py:196-248's
    --pa_xray/--lat_xray surface). Returns (1, 2, 1, size, size) fp32 in
    normalize_range."""
    from PIL import Image

    from ..data.dataset import _np_resize_bilinear

    views = []
    for p in (pa_path, lat_path):
        img = np.asarray(Image.open(p).convert("L"), dtype=np.float32)
        if img.shape != (size, size):
            img = _np_resize_bilinear(img, (size, size))
        if img.max() > 1.0:
            img = img / 255.0
        lo, hi = normalize_range
        views.append(img * (hi - lo) + lo)
    return np.stack(views)[None, :, None].astype(np.float32)  # (1, 2, 1, S, S)


def export_nifti(volume: np.ndarray, path: str, spacing: Tuple[float, float, float] = (1.0, 1.0, 1.0)) -> None:
    """Save (D, H, W) as .nii.gz with a diagonal affine (pure-Python NIfTI-1
    writer — nibabel is not required)."""
    from ..data.nifti import write_nifti

    write_nifti(path, np.asarray(volume, np.float32), spacing)


def export_orthogonal_views(volume: np.ndarray, out_prefix: str, title: str = "") -> None:
    """Axial/coronal/sagittal mid-slice PNGs (matplotlib Agg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    D, H, W = volume.shape
    views = {
        "axial": volume[D // 2],
        "coronal": volume[:, H // 2],
        "sagittal": volume[:, :, W // 2],
    }
    for name, sl in views.items():
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.imshow(sl, cmap="gray")
        ax.set_title(f"{title} {name}".strip())
        ax.axis("off")
        fig.savefig(f"{out_prefix}_{name}.png", dpi=120, bbox_inches="tight")
        plt.close(fig)


def inspect_checkpoint(ckpt_dir: str) -> Dict:
    """Dump checkpoint keys/shapes (ref: inspect_checkpoint.py)."""
    path = Path(ckpt_dir)
    meta = {}
    mf = path / "meta.json"
    if mf.exists():
        meta = json.loads(mf.read_text())
    report = {"path": str(path), "meta": meta, "arrays": {}}
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        m = ckptr.metadata(path.absolute())
        tree = m.item_metadata if hasattr(m, "item_metadata") else m
        flat = jax.tree_util.tree_flatten_with_path(tree)[0]
        for kp, leaf in flat:
            name = "/".join(str(getattr(k, "key", k)) for k in kp)
            report["arrays"][name] = str(getattr(leaf, "shape", leaf))
    except Exception as e:  # metadata best-effort
        report["error"] = repr(e)
    return report


class InferenceEngine:
    """Load a checkpoint (+ embedded config) and reconstruct volumes."""

    def __init__(self, checkpoint_dir: str, config: Optional[Config] = None,
                 max_stage: int = 3):
        """max_stage (cascade only): restore template depth — pass 2 to load
        a stage-pruned checkpoint (e.g. the committed eval-reproduction
        artifact, which drops the stage3 subtree) and evaluate stages ≤2."""
        from ..utils import setup_compile_cache

        setup_compile_cache()  # 256³ serving program: minutes cold, s cached
        ckpt_path = Path(checkpoint_dir)
        meta_file = ckpt_path / "meta.json"
        if config is None:
            if not meta_file.exists():
                raise ValueError(f"no config given and no meta.json in {checkpoint_dir}")
            meta = json.loads(meta_file.read_text())
            config = Config.from_dict(meta.get("config", {}))
        self.cfg = config
        self.model = build_model(config)
        self.max_stage = max_stage

        # template init to restore into
        xr_shape = (1, 2, 1, config.data.xray_size, config.data.xray_size)
        kw = {"max_stage": max_stage} if config.model.family == "cascade" else {}
        template = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), jnp.zeros(xr_shape, jnp.float32), **kw)
        )
        template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
        mgr = CheckpointManager(str(ckpt_path.parent))
        restored, self.meta = mgr.restore(str(ckpt_path), dict(template))
        self.variables = restored
        self._jitted = {}

    def _forward(self, **kw):
        key = tuple(sorted(kw.items()))
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda v, x: self.model.apply(v, x, train=False, **kw)
            )
        return self._jitted[key]

    def reconstruct(self, xrays: np.ndarray, max_stage: int = 3, return_intermediate: bool = False):
        """xrays: (B, 2, 1, S, S) → (B, 1, D, H, W) (or stage dict)."""
        xr = jnp.asarray(xrays, jnp.float32)
        if self.cfg.model.family == "cascade":
            fn = self._forward(max_stage=max_stage, return_intermediate=return_intermediate)
        else:
            fn = self._forward()
        return jax.device_get(fn(self.variables, xr))

    def evaluate_sample(self, item: Dict, max_stage: int = 3) -> Dict[str, float]:
        """Per-stage PSNR/SSIM/L1 vs (resized) target
        (inference_progressive.py:66-91)."""
        xr = item["drr_stacked"][None]
        target = jnp.asarray(item["ct_volume"][None], jnp.float32)
        metrics: Dict[str, float] = {}
        if self.cfg.model.family == "cascade":
            outs = self.reconstruct(xr, max_stage=max_stage, return_intermediate=True)
            for stage, vol in outs.items():
                t = resize_target(target, vol.shape[-3:])
                v = jnp.asarray(vol)
                metrics[f"{stage}_psnr"] = float(psnr(v, t))
                metrics[f"{stage}_ssim"] = float(ssim_metric(v, t))
                metrics[f"{stage}_l1"] = float(mae(v, t))
        else:
            vol = jnp.asarray(self.reconstruct(xr))
            t = resize_target(target, vol.shape[-3:])
            metrics["psnr"] = float(psnr(vol, t))
            metrics["psnr_dynamic"] = float(psnr_dynamic_range(vol, t))
            metrics["ssim"] = float(ssim_metric(vol, t))
            metrics["l1"] = float(mae(vol, t))
        return metrics

    def diagnose(self, item: Dict, max_stage: int = 1) -> Dict:
        """Diagnostic-loss suite + health grades on one sample with LIVE
        cross-attention capture (diagnostic_losses.py:172-660 +
        vit_components.py:63-108's store_attention — in the reference the
        attention-map diagnostics were unreachable outside its diffusion
        harness; here any ViT-family checkpoint can be graded)."""
        from ..losses.diagnostics import DiagnosticLosses, analyze_component_health
        from ..models import collect_attention_maps

        xr = jnp.asarray(item["drr_stacked"][None], jnp.float32)
        target = jnp.asarray(item["ct_volume"][None], jnp.float32)
        model = self.model
        if hasattr(model, "store_attention"):
            model = model.clone(store_attention=True)
        kw = {"max_stage": max_stage} if self.cfg.model.family == "cascade" else {}
        vol, st = model.apply(self.variables, xr, train=False,
                              mutable=["intermediates"], **kw)
        maps = collect_attention_maps(st.get("intermediates", {}))
        vol = jnp.asarray(vol, jnp.float32)
        t = resize_target(target, vol.shape[-3:])
        diag = DiagnosticLosses()
        losses = diag(vol, t, vol, t, xr, attention_maps=maps or None)
        flat = {k: float(v) for k, v in losses.items() if jnp.ndim(v) == 0}
        return {"losses": flat, "health": analyze_component_health(losses),
                "captured_attention": sorted(maps.keys())}

    def export(
        self,
        xrays: np.ndarray,
        out_dir: str,
        prefix: str = "pred",
        upscale: Optional[Tuple[int, int, int]] = None,
        denormalize: bool = False,
        target: Optional[np.ndarray] = None,
    ) -> Dict[str, str]:
        """Reconstruct and write .npy + .nii.gz + orthogonal PNGs
        (inference_direct.py:238-276, inference_direct128.py:114-192), plus
        the 18-panel summary figure incl. MIP (inference_direct.py:98-235;
        error/target panels and the metric suptitle need `target`,
        (B, 1, D, H, W) at any resolution — it is resized to the output)."""
        out = Path(out_dir)
        out.mkdir(parents=True, exist_ok=True)
        raw = self.reconstruct(xrays)
        vol = np.asarray(raw)[0, 0]  # (D, H, W)
        try:
            from ..utils.viz import inference_summary_figure

            t = metrics = None
            if target is not None:
                t = np.asarray(resize_target(jnp.asarray(target, jnp.float32), vol.shape))
                v = jnp.asarray(raw, jnp.float32)
                metrics = {"psnr": float(psnr(v, jnp.asarray(t))),
                           "ssim": float(ssim_metric(v, jnp.asarray(t))),
                           "mae": float(mae(v, jnp.asarray(t)))}
            fig_path = out / f"{prefix}_summary.png"
            inference_summary_figure(np.asarray(xrays), np.asarray(raw, np.float32),
                                     t, metrics, str(fig_path))
            summary_path = str(fig_path)  # only after a successful write — a
            # stale file from a previous export must not be reported as ours
        except Exception as e:  # matplotlib issues must not kill the export
            print(f"[infer] summary figure skipped: {e}")
            summary_path = None
        if upscale is not None:
            vol = np.asarray(resize_trilinear(jnp.asarray(vol)[None], upscale, align_corners=False))[0]
        if denormalize:
            vol = denormalize_ct(vol, self.cfg.data.normalization)
        paths = {}
        if summary_path:
            paths["summary"] = summary_path
        np.save(out / f"{prefix}.npy", vol)
        paths["npy"] = str(out / f"{prefix}.npy")
        try:
            export_nifti(vol, out / f"{prefix}.nii.gz")
            paths["nifti"] = str(out / f"{prefix}.nii.gz")
        except Exception as e:
            paths["nifti_error"] = repr(e)
        export_orthogonal_views(vol, str(out / prefix), title=prefix)
        paths["views"] = str(out / f"{prefix}_axial.png")
        return paths

    def export_serving(self, output_path: str, batch_size: int = 1, max_stage: int = 3,
                       platforms: Optional[Tuple[str, ...]] = None) -> Dict:
        """Serialize the inference function INCLUDING the checkpoint weights
        into one self-contained StableHLO artifact (jax.export): the serving
        side needs only `load_serving(path)` — no model code, no checkpoint
        tree, no config. Exceeds the reference's surface (it has no export
        path; serving there means shipping the training repo + torch.load).

        platforms: lowering targets, e.g. ("tpu", "cpu") for an artifact
        that runs on both; default = the current backend only.
        """
        from jax import export as jexport

        cfg = self.cfg
        xr_shape = (batch_size, 2, 1, cfg.data.xray_size, cfg.data.xray_size)
        kw = {"max_stage": max_stage} if cfg.model.family == "cascade" else {}
        variables = self.variables

        def fn(xrays):
            return self.model.apply(variables, xrays, train=False, **kw)

        exp = jexport.export(
            jax.jit(fn), platforms=[p for p in platforms] if platforms else None,
        )(jax.ShapeDtypeStruct(xr_shape, jnp.float32))
        data = exp.serialize()
        out = Path(output_path)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_bytes(data)
        info = {
            "path": str(out), "bytes": len(data),
            "platforms": list(exp.platforms),
            "input_shape": list(xr_shape),
            "output_shape": [list(o.shape) for o in exp.out_avals],
            "family": cfg.model.family,
        }
        (out.parent / (out.name + ".json")).write_text(json.dumps(info, indent=2))
        return info

    def evaluate_dataset(self, dataset, out_json: Optional[str] = None, max_stage: int = 3) -> Dict:
        """Full-dataset mean±std metrics + json dump
        (inference_progressive.py:191-231, 352-363)."""
        rows = [self.evaluate_sample(dataset[i], max_stage) for i in range(len(dataset))]
        summary = {}
        for k in rows[0]:
            vals = np.asarray([r[k] for r in rows], np.float64)
            summary[k] = {"mean": float(vals.mean()), "std": float(vals.std())}
        if out_json:
            Path(out_json).write_text(json.dumps({"per_sample": rows, "summary": summary}, indent=2))
        return summary


def load_serving(path: str):
    """Load an `InferenceEngine.export_serving` artifact → callable
    (xrays fp32 (B, 2, 1, S, S)) → reconstructed volume. Weights are baked
    into the artifact; works in a process that never imports the model code
    or reads a checkpoint."""
    from jax import export as jexport

    exp = jexport.deserialize(bytearray(Path(path).read_bytes()))
    return lambda xrays: exp.call(jnp.asarray(xrays, jnp.float32))
