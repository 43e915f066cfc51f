"""Typed configuration.

Replaces the reference's import-time YAML singleton with stack-inspection
magic (src/config.py:17-81) by explicit frozen dataclasses. The YAML schema
of the 12 release configs (configs/release/*.yaml) is accepted verbatim via
``Config.from_yaml``; derived fields (num_views, per-dataset defaults) are
computed in ``finalize`` rather than injected into a mutable dict.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import subprocess
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Mapping, Sequence

import yaml


@dataclass(frozen=True)
class LRSchedulerConfig:
    gamma: float = 0.5
    milestones: tuple[int, ...] = (15, 30, 45, 60)


@dataclass(frozen=True)
class DataConfig:
    name: str = "ho3d"
    batch_size: int = 16
    dataset_dir: str = "data/ho3d"
    mask_size: int = 32
    depth_size: int = 32
    heatmap_size: int = 32
    image_size: int = 256
    mano_models_dir: str = "mano"
    num_workers: int = 6
    augment: bool = True
    # opt-in decode-side downscale (1 = off): libjpeg DCT-domain scaling in
    # the native loader (fewer IDCTs + fewer pixels; measured gain is
    # JPEG-content dependent — LOADER_BENCH.json records both denoms) for
    # decode-bound hosts; crops resample the same bbox region from the
    # smaller frame (documented deviation: crop detail capped at source/denom)
    decode_scale_denom: int = 1
    # opt-in decode-once cache: the first full pass over a split persists
    # decoded uint8 frames + parsed labels to an mmap-able store; later
    # epochs never touch libjpeg (data/cache.py — the lever for
    # decode-bound hosts, LOADER_BENCH.json)
    cache_decoded: bool = False
    cache_dir: str = ""  # default: <dataset_dir>/decoded_cache
    pad_image: bool = True
    add_val_to_train: bool = False
    # copied over from model (reference config.py:46-49 does the same)
    selected_views: tuple[int, ...] = (0, 1, 2, 3, 4)
    mask_invisible_joints: bool = True
    # corrected per-split sample counts, e.g. {"train": 7000, "val": 1200}.
    # Overrides the dataset class's hardcoded split_sizes (which for
    # DexYCB/MVHand are extrapolations — data/dexycb.py, data/mvhand.py);
    # `scripts/validate_dataset.py` emits this block when real tars disagree.
    split_size_overrides: Mapping[str, int] | None = None

    @property
    def num_views(self) -> int:
        return len(self.selected_views)


@dataclass(frozen=True)
class ModelConfig:
    selected_views: tuple[int, ...] = (0, 1, 2, 3, 4)
    fusion: str = "cross_attn"  # or "cross_attn_learnable_query"
    fusion_layers: int = 5
    pos_enc: tuple[str, ...] = ("pos2d", "crop", "sin")
    use_gcn: bool = True
    backbone: str = "resnet"  # "resnet" | "hrnet" | "hourglass"
    backbone_type: str = "50_paper"  # resnet: 18/34/50_paper; hrnet: w40/w64
    backbone_early_return: int = 3
    backbone_channels: tuple[int, ...] = (1024,)
    backbone_pretrained: bool = True
    backbone_pretrained_path: str = ""
    freeze_bn: bool = False
    get_vertices: bool = False
    num_joints: int = 21
    # eval-time batch->channel grouped packing of HRNet's lane-underfilled
    # branch convs (models/backbones/hrnet.py HRModule._branch_grouped).
    # Opt-in pending the on-chip probe verdict (BRANCH_PACKING_PROBE.json).
    hrnet_branch_grouped: bool = False
    # exact space-to-depth rewrite of the ResNet 7x7/s2 stem conv (same
    # math, 4x MXU lane fill — resnet.SpaceToDepthStem). Default on; flip
    # off to run the textbook stride-2 conv.
    resnet_stem_s2d: bool = True
    # serving-time int8 PTQ of the ResNet block convs (ops/quant.py:
    # per-channel weight + dynamic per-tensor activation scales, int32
    # accumulation). NOT exact math — opt-in, eval-only; speed/accuracy
    # disposition measured on chip in INT8_PROBE.json.
    backbone_int8: bool = False

    @property
    def num_views(self) -> int:
        return len(self.selected_views)

    @property
    def feat_dim(self) -> int:
        """Token feature width entering the fusion transformer.

        sum(backbone_channels)/2 from the per-level SampleNets, +2 for raw 2D
        coords, +10 for the crop-FoV encoding (reference handmvnet.py:88-95).
        """
        d = int(sum(self.backbone_channels) / 2)
        if "pos2d" in self.pos_enc:
            d += 2
        if "crop" in self.pos_enc:
            d += 10
        return d


@dataclass(frozen=True)
class LossWeights:
    heatmap: float = 10.0
    joints_2d: float = 1.0
    joints_3d: float = 1000.0
    g2d: float | None = 1.0  # None disables the reprojection losses
    p2d: float | None = 0.5


@dataclass(frozen=True)
class TrainConfig:
    debug: bool = False
    vis_every_n_epochs: int = 10
    epochs: int = 100
    accumulate_batch: int = 2
    gpus: int = 1  # accepted from reference YAMLs; means "device count"
    mask_invisible_joints: bool = True
    root_relative: bool = True
    loss_weights: LossWeights = field(default_factory=LossWeights)
    lr: float = 1e-4
    lr_scheduler: LRSchedulerConfig = field(default_factory=LRSchedulerConfig)
    weight_decay: float = 0.05
    grad_clip: float = 1.0
    seed: int = 42
    # TPU-specific knobs (not in the reference schema)
    compute_dtype: str = "float32"  # "bfloat16" for speed, "float32" for parity
    num_devices: int = 0  # 0 = use all available
    # Backbone-block rematerialization in the train step: "auto" applies the
    # measured policy (TRAIN_REMAT_PROBE.json: remat-free is ~24% faster and
    # fits one v5e at the release recipes — parallel.resolve_remat), "on" /
    # "off" force it.
    remat: str = "auto"


@dataclass(frozen=True)
class Config:
    name: str = "handmvnet"
    base_output_dir: str = "./outputs/debug"
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    @property
    def auc_thresholds(self) -> tuple[float, float]:
        """Per-dataset PCK-AUC threshold range in meters (reference handmvnet.py:117-125)."""
        return {"dexycb": (0.0, 0.02), "ho3d": (0.0, 0.05), "mvhand": (0.0, 0.02)}[self.data.name]

    @property
    def root_idx(self) -> int:
        """Root camera index per dataset (reference ho3d.py:93; DexYCB/MVHand
        from notebooks/infer_vis.ipynb cell 2)."""
        return {"ho3d": 0, "dexycb": 2, "mvhand": 3}[self.data.name]

    @staticmethod
    def from_yaml(path: str | Path, **overrides: Any) -> "Config":
        raw = yaml.safe_load(Path(path).read_text())
        return Config.from_dict(raw, **overrides)

    @staticmethod
    def from_dict(raw: Mapping[str, Any], **overrides: Any) -> "Config":
        raw = dict(raw)
        model_raw = dict(raw.get("model", {}))
        data_raw = dict(raw.get("data", {}))
        train_raw = dict(raw.get("train", {}))

        # the reference copies these from model into data (config.py:46-49)
        if "selected_views" in model_raw:
            data_raw.setdefault("selected_views", model_raw["selected_views"])
        if "mask_invisible_joints" in train_raw:
            data_raw.setdefault("mask_invisible_joints", train_raw["mask_invisible_joints"])

        lw_raw = dict(train_raw.pop("loss_weights", {}))
        sched_raw = dict(train_raw.pop("lr_scheduler", {}))
        lw = _build(LossWeights, lw_raw, fill_missing_none=("g2d", "p2d"))
        sched = _build(LRSchedulerConfig, sched_raw)

        cfg = Config(
            name=raw.get("name", "handmvnet"),
            base_output_dir=raw.get("base_output_dir", "./outputs/debug"),
            data=_build(DataConfig, data_raw),
            model=_build(ModelConfig, model_raw),
            train=dataclasses.replace(
                _build(TrainConfig, train_raw), loss_weights=lw, lr_scheduler=sched
            ),
        )
        return cfg.replace(**overrides) if overrides else cfg

    def replace(self, **kw: Any) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def dump(self, out_dir: str | Path) -> Path:
        """Write the resolved config (+ git hash, like config.py:66-75) to out_dir."""
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        payload = self.to_dict()
        try:
            payload["git_hash"] = (
                subprocess.check_output(["git", "rev-parse", "HEAD"], stderr=subprocess.DEVNULL)
                .decode()
                .strip()
            )
        except Exception:
            payload["git_hash"] = None
        # record the batch-scheduler job id like the reference (config.py:68)
        import os

        payload["slurm_job_id"] = os.environ.get("SLURM_JOB_ID")
        path = out_dir / "config.yaml"
        path.write_text(yaml.safe_dump(payload, sort_keys=False))
        return path

    def fingerprint(self) -> str:
        return hashlib.sha1(json.dumps(self.to_dict(), sort_keys=True, default=str).encode()).hexdigest()[:12]


def _build(cls, raw: Mapping[str, Any], fill_missing_none: Sequence[str] = ()):
    """Construct dataclass from a raw dict, ignoring unknown keys and
    coercing lists to tuples. Keys in fill_missing_none default to None when
    absent (the reference checks membership, e.g. 'g2d' in loss_weights)."""
    names = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for key, value in raw.items():
        if key not in names:
            continue
        if isinstance(value, list):
            value = tuple(value)
        kwargs[key] = value
    for key in fill_missing_none:
        if key not in raw and key in names:
            kwargs[key] = None
    return cls(**kwargs)
