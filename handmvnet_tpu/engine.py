"""Training/evaluation engine: metric assembly, epoch loops, checkpoint
management. The TPU-native replacement for the reference's Lightning
plumbing (train/validate/test steps, checkpoint-on-val_mpjpe, val.json dumps;
reference: src/models/handmvnet.py:353-516, src/train.py, src/eval.py).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Callable, Dict, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from handmvnet_tpu import metrics as M
from handmvnet_tpu.config import Config
from handmvnet_tpu.ops.geometry import mask_joints


def pose_metrics_device(
    out: Mapping[str, jax.Array],
    labels: Mapping[str, jax.Array],
    auc_thresholds: tuple[float, float],
    mask_invisible: bool = True,
    root_relative: bool = True,
    vertices_fn: Callable | None = None,
) -> Dict[str, jax.Array]:
    """Reference metric assembly (_calculate_mpjpe, handmvnet.py:370-423) as
    one jittable device computation — mpjpe family in mm, AUC/PCK aggregates,
    optional vertex metrics (labels in meters)."""
    lo, hi = auc_thresholds
    pred2d, gt2d = out["joints_crop_img"], labels["joints_crop_img"]
    if "joints_img_mask" in labels and mask_invisible:
        m = labels["joints_img_mask"]
        pred2d = mask_joints(pred2d, m)
        gt2d = mask_joints(gt2d, m)

    pj = out["joints_cam"]
    gj = labels["joints_cam"]
    auc = M.pck_auc(pj, gj, lo, hi, steps=20)
    result: Dict[str, jax.Array] = {
        "mpjpe2d": M.mpjpe(pred2d, gt2d),
        "mpjpe": M.mpjpe(pj, gj) * 1000.0,
        "pa_mpjpe": M.pa_mpjpe(pj, gj) * 1000.0,
        "auc_j": auc.auc,
        "norm_auc_j": auc.norm_auc,
        "pck_j": auc.pck_values,
    }

    if vertices_fn is not None and "vertices" in labels:
        pred_verts = vertices_fn(out["joints_cam"] * 1000.0) / 1000.0  # meters
        gt_verts = labels["vertices"]
        auc_v = M.pck_auc(pred_verts, gt_verts, lo, hi, steps=20)
        result.update(
            mpvpe=M.mpjpe(pred_verts, gt_verts) * 1000.0,
            pa_mpvpe=M.pa_mpjpe(pred_verts, gt_verts) * 1000.0,
            auc_v=auc_v.auc,
            norm_auc_v=auc_v.norm_auc,
            pck_v=auc_v.pck_values,
        )

    if not root_relative and "root_joint" in out:
        result["w_mpjpe"] = (
            M.mpjpe(out["joints_cam"] + out["root_joint"], gj + labels["root_joint"]) * 1000.0
        )
    return result


def labels_in_meters(batch: Mapping[str, np.ndarray]) -> Dict[str, Any]:
    labels = dict(batch)
    labels["joints_cam"] = jnp.asarray(batch["joints_cam"]) / 1000.0
    labels["root_joint"] = jnp.asarray(batch["root_joint"]) / 1000.0
    if "vertices" in batch:
        labels["vertices"] = jnp.asarray(batch["vertices"]) / 1000.0
    return labels


class MetricAverager:
    """Running mean of scalar metrics over an epoch (list-valued entries like
    PCK curves are averaged elementwise)."""

    def __init__(self) -> None:
        self._sums: Dict[str, Any] = {}
        self._count = 0.0

    def update(self, metrics: Mapping[str, Any], weight: float = 1.0) -> None:
        """weight: sample count of this batch — per-batch metric means must
        be weighted when batch sizes are uneven or the epoch average biases
        toward small batches."""
        self._count += weight
        for k, v in metrics.items():
            v = np.asarray(v, dtype=np.float64) * weight
            self._sums[k] = self._sums.get(k, 0.0) + v

    def result(self) -> Dict[str, Any]:
        if not self._sums:
            return {}
        out = {}
        for k, v in self._sums.items():
            avg = v / self._count  # count > 0 whenever _sums is non-empty
            out[k] = avg.tolist() if avg.ndim else float(avg)
        return out


@jax.jit
def _tree_add(a, b):
    # module-level so every DeviceMetricAverager instance (one per epoch)
    # shares one compiled executable instead of retracing a fresh lambda
    return jax.tree.map(jnp.add, a, b)


@jax.jit
def _tree_scale(a, w):
    # w is traced (not static): one compile per tree structure, not one per
    # distinct batch size — uneven batches stay cheap
    return jax.tree.map(lambda v: v * w, a)


class DeviceMetricAverager:
    """MetricAverager that keeps the running sums ON DEVICE: one tiny jitted
    tree-add per update, a single device->host read in result().

    Per-step host reads (float()/device_get) both serialize the device
    timeline against the host loop and — on relayed TPU transports —
    permanently degrade transfer throughput by an order of magnitude
    (CLAUDE.md invariant), so an epoch must sync exactly once."""

    def __init__(self) -> None:
        self._sums = None
        self._count = 0.0

    def update(self, metrics: Mapping[str, Any], weight: float = 1.0) -> None:
        """weight: sample count of this batch (see MetricAverager.update);
        scaling happens on device so no extra host sync is introduced."""
        self._count += weight
        metrics = dict(metrics)
        if weight != 1.0:
            metrics = _tree_scale(metrics, jnp.float32(weight))
        self._sums = metrics if self._sums is None else _tree_add(self._sums, metrics)

    def result(self) -> Dict[str, Any]:
        if self._sums is None:
            return {}
        host = jax.device_get(self._sums)
        out = {}
        for k, v in host.items():
            avg = np.asarray(v, np.float64) / self._count  # > 0 when _sums set
            out[k] = avg.tolist() if avg.ndim else float(avg)
        return out


class JsonlLogger:
    """Append-only metrics log (one JSON object per line) + stdout echo +
    optional TensorBoard scalars (the reference logs through Lightning to TB,
    train.py default_root_dir/lightning_logs)."""

    def __init__(self, path: str | Path, echo: bool = True, tensorboard_dir: str | Path | None = None):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self.echo = echo
        self._tb = None
        if tensorboard_dir is not None:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(str(tensorboard_dir))
            except Exception as e:  # pragma: no cover
                print(f"[warning] tensorboard unavailable: {e}")

    def log(self, record: Mapping[str, Any]) -> None:
        rec = {k: v for k, v in record.items() if not isinstance(v, (list, tuple))}
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
        if self._tb is not None:
            step = int(record.get("epoch", record.get("step", 0)))
            for k, v in rec.items():
                if isinstance(v, (int, float)) and k not in ("epoch", "step"):
                    self._tb.add_scalar(k, v, step)
            self._tb.flush()
        if self.echo:
            print(
                " ".join(
                    f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in rec.items()
                ),
                flush=True,
            )


class CheckpointManager:
    """Best-on-val_mpjpe + last checkpointing with the reference's filename
    convention ``{epoch}-{step}-{val_mpjpe:.3f}`` (reference train.py:34)."""

    def __init__(self, out_dir: str | Path):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.best_val = float("inf")
        self.best_path: Path | None = None
        # persist best-so-far so a --resume after preemption doesn't demote
        # the pre-preemption best checkpoint
        self._meta_path = self.out_dir / "best.json"
        if self._meta_path.exists():
            try:
                meta = json.loads(self._meta_path.read_text())
                bp = meta.get("best_path")
                if bp and Path(bp).exists():
                    self.best_val = float(meta.get("best_val", float("inf")))
                    self.best_path = Path(bp)
            except (ValueError, OSError):  # corrupt meta: start fresh
                pass

    def save(self, state, epoch: int, val_mpjpe: float) -> None:
        from handmvnet_tpu.checkpoint import save_checkpoint

        last = self.out_dir / "last"
        save_checkpoint(last, state)
        if val_mpjpe < self.best_val:
            prev_best = self.best_path
            self.best_val = val_mpjpe
            name = f"epoch={epoch}-step={int(state.step)}-val_mpjpe={val_mpjpe:.3f}"
            path = self.out_dir / name
            save_checkpoint(path, state)
            self.best_path = path
            self._meta_path.write_text(
                json.dumps({"best_val": self.best_val, "best_path": str(path)})
            )
            # keep best + last only (Lightning ModelCheckpoint save_top_k=1,
            # reference train.py:34): a full orbax state is ~3x model size,
            # and early training improves val_mpjpe nearly every epoch
            if prev_best is not None and prev_best != path and prev_best.exists():
                import shutil

                shutil.rmtree(prev_best, ignore_errors=True)

    def restore_best(self, template):
        from handmvnet_tpu.checkpoint import restore_checkpoint

        path = self.best_path or (self.out_dir / "last")
        return restore_checkpoint(path, template)


def make_vertices_fn(cfg: Config) -> Callable | None:
    """Jitted joints->MANO-vertices map for MPVPE metrics (reference gates it
    on `get_vertices`, handmvnet.py:390-408). None when the licensed MANO pkl
    is absent (with a warning), so training still runs."""
    try:
        from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
        from handmvnet_tpu.models.mano import ManoLayer, load_mano_model

        mano = ManoLayer(load_mano_model(cfg.data.mano_models_dir))
        return jax.jit(joints_to_vertices_fn(mano))
    except (FileNotFoundError, OSError) as e:
        print(f"[warning] MANO model unavailable ({e}); skipping vertex metrics")
        return None


# value is (vertices_fn, jitted_metrics_fn): storing the callable in the
# entry both pins it alive (so its id cannot be recycled) and lets the
# lookup verify identity explicitly instead of trusting id() alone
_METRICS_FN_CACHE: Dict[tuple, tuple] = {}


def _cached_metrics_fn(auc_thresholds, root_relative: bool, vertices_fn):
    key = (tuple(auc_thresholds), bool(root_relative), id(vertices_fn))
    entry = _METRICS_FN_CACHE.get(key)
    fn = entry[1] if entry is not None and entry[0] is vertices_fn else None
    if fn is None:
        import functools

        fn = jax.jit(
            functools.partial(
                pose_metrics_device,
                auc_thresholds=auc_thresholds,
                mask_invisible=True,
                root_relative=root_relative,
                vertices_fn=vertices_fn,
            )
        )
        _METRICS_FN_CACHE[key] = (vertices_fn, fn)
    return fn


def evaluate(
    eval_step: Callable,
    state,
    loader: Iterable[Mapping[str, Any]],
    cfg: Config,
    mode: str = "val",
    vertices_fn: Callable | None = None,
    prepare: Callable | None = None,
) -> Dict[str, Any]:
    """Run one evaluation pass and return averaged metrics. The metric
    assembly is jitted once per distinct configuration (cached across
    epochs: a fresh jit(partial(...)) per call would retrace + recompile
    the whole metrics program — including the MANO IK/LBS graph when
    vertices_fn is set — every validation pass)."""
    metrics_fn = _cached_metrics_fn(
        cfg.auc_thresholds, cfg.train.root_relative, vertices_fn
    )
    avg = DeviceMetricAverager()  # one host sync per epoch, not per batch
    for batch in loader:
        if prepare is not None:
            batch = prepare(batch)
        out = eval_step(state, batch)
        labels = labels_in_meters(batch)
        device = metrics_fn(out, {k: labels[k] for k in labels if k in (
            "joints_crop_img", "joints_cam", "root_joint", "vertices", "joints_img_mask")})
        # weight by batch size: per-batch means over uneven batch sizes
        # (e.g. a future ragged multihost split) must not bias the epoch mean.
        # .shape is metadata — no D2H read on device arrays
        avg.update(device, weight=float(batch["rgb"].shape[0]))
    result = avg.result()
    return {f"{mode}_{k}": v for k, v in result.items()}


def write_results_json(path: str | Path, results: Mapping[str, Any]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        json.dump([dict(results)], f, indent=2, default=float)
