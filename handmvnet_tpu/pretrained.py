"""ImageNet-pretrained backbone initialization.

Reference behavior being reproduced:
  * ResNet (reference src/models/backbones/resnet.py:257-296, 205-213):
    a torchvision ImageNet state_dict is loaded strictly; the "paper"
    variant first drops ``layer4.*`` and ``fc.*``.
  * HRNet (reference src/models/backbones/hrnet.py:409-426): PARTIAL load —
    only keys already present in the model are taken, the rest keep their
    fresh initialization (the official hrnetv2 ImageNet checkpoints carry a
    classification head the pose model doesn't have).
  * Wiring (reference src/models/handmvnet.py:43-66): ``backbone_pretrained``
    toggles it, ``backbone_pretrained_path`` points at the weight file/dir
    (reference joins ``hrnetv2_{type}_imagenet_pretrained.pth``).

This environment has no model-zoo egress, so the weights must exist locally:
``backbone_pretrained_path`` may be the file itself (.pth torch pickle or
.npz) or a directory containing the conventionally named file.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Mapping

import numpy as np

from handmvnet_tpu.checkpoint import convert_torch_state_dict, flatten_tree

_RESNET_FILE_CANDIDATES = (
    "resnet{v}_imagenet.pth",
    "resnet{v}.pth",
    "resnet{v}_imagenet.npz",
    "resnet{v}.npz",
)


def load_state_dict_file(path: str | Path) -> dict[str, np.ndarray]:
    """Read a torch pickle (.pth/.pt) or .npz into {key: ndarray}. Unwraps a
    nested 'state_dict' entry (common in released HRNet checkpoints)."""
    path = Path(path)
    if path.suffix == ".npz":
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj and all(
        hasattr(v, "shape") for v in obj["state_dict"].values()
    ):
        obj = obj["state_dict"]
    return {
        k: (v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v))
        for k, v in obj.items()
    }


def resolve_pretrained_path(cfg_model) -> Path:
    """Map (backbone, backbone_type, backbone_pretrained_path) to a weight
    file, following the reference's directory-join convention."""
    raw = cfg_model.backbone_pretrained_path
    p = Path(raw)
    if p.is_file():
        return p
    if p.is_dir():
        if cfg_model.backbone == "hrnet":
            # reference handmvnet.py:48
            cand = p / f"hrnetv2_{cfg_model.backbone_type}_imagenet_pretrained.pth"
            if cand.is_file():
                return cand
        else:
            ver = "".join(c for c in cfg_model.backbone_type if c.isdigit())
            for pat in _RESNET_FILE_CANDIDATES:
                cand = p / pat.format(v=ver)
                if cand.is_file():
                    return cand
    raise FileNotFoundError(
        f"no pretrained backbone weights found at {raw!r} for "
        f"{cfg_model.backbone}/{cfg_model.backbone_type}"
    )


def _graft(dst: Mapping, src: Mapping, taken: list, prefix: tuple = ()) -> dict:
    """Copy of `dst` with every leaf that also exists (same path) in `src`
    replaced; records taken paths."""
    out = {}
    for k, v in dst.items():
        if isinstance(v, Mapping):
            out[k] = _graft(v, src.get(k, {}), taken, prefix + (k,))
        elif isinstance(src, Mapping) and k in src:
            arr = np.asarray(src[k])
            if tuple(arr.shape) != tuple(np.shape(v)):
                raise ValueError(
                    f"pretrained shape mismatch at {'.'.join(prefix + (k,))}: "
                    f"model {np.shape(v)} vs checkpoint {arr.shape}"
                )
            out[k] = arr.astype(np.asarray(v).dtype)
            taken.append(prefix + (k,))
        else:
            out[k] = v
    return out


def graft_backbone(
    variables: Mapping[str, Any],
    state_dict: Mapping[str, Any],
    backbone: str,
    variant: str = "default",
) -> dict:
    """Return a copy of model variables {params, batch_stats} with the
    ``backbone`` subtree initialized from a torch backbone state_dict.

    backbone: "resnet" (strict: every model backbone param must be covered)
    or "hrnet" (partial load, reference hrnet.py:420-425).
    variant: "paper" drops layer4/fc first (reference resnet.py:207-211).
    """
    sd = dict(state_dict)
    if backbone == "resnet":
        if variant == "paper":
            sd = {k: v for k, v in sd.items() if not k.startswith("layer4")}
        # our flax backbone never has the classification head
        sd = {k: v for k, v in sd.items()
              if not k.startswith("fc.") and not k.startswith("classifier")}
    converted = convert_torch_state_dict(sd)

    out = {}
    taken: list[tuple[str, ...]] = []
    for coll in variables:
        if coll not in ("params", "batch_stats") or "backbone" not in variables[coll]:
            out[coll] = variables[coll]
            continue
        tree = dict(variables[coll])
        tree["backbone"] = _graft(
            variables[coll]["backbone"], converted.get(coll, {}), taken
        )
        out[coll] = tree

    if backbone == "resnet":
        model_keys = set()
        for coll in ("params", "batch_stats"):
            if coll in variables and "backbone" in variables[coll]:
                model_keys |= set(flatten_tree(variables[coll]["backbone"]))
        missing = sorted(model_keys - set(taken))
        if missing:
            raise ValueError(
                f"pretrained resnet load is strict (reference resnet.py:213) "
                f"but {len(missing)} model keys were not in the checkpoint, "
                f"e.g. {['.'.join(m) for m in missing[:6]]}"
            )
    elif not taken:
        raise ValueError("pretrained hrnet checkpoint matched zero model keys")
    return out


def load_pretrained_backbone(state, cfg):
    """Apply cfg.model.backbone_pretrained{,_path} to a TrainState (call
    right after create_train_state, before any resume)."""
    if not cfg.model.backbone_pretrained:
        return state
    if not cfg.model.backbone_pretrained_path:
        # the reference downloads from the torchvision zoo when pretrained is
        # on with no path (resnet.py:264); no egress here, so an empty path
        # means random init — loudly, since it changes training parity
        print(
            "[warning] backbone_pretrained=True but no backbone_pretrained_path "
            "set and no model-zoo egress — training from random backbone init"
        )
        return state
    path = resolve_pretrained_path(cfg.model)
    sd = load_state_dict_file(path)
    variant = "paper" if "paper" in cfg.model.backbone_type else "default"
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    grafted = graft_backbone(variables, sd, cfg.model.backbone, variant)
    print(f"loaded pretrained {cfg.model.backbone} backbone from {path}")
    return state.replace(
        params=grafted["params"], batch_stats=grafted["batch_stats"]
    )
