"""Checkpointing: orbax-based native checkpoints + a PyTorch state_dict
converter for parity against the reference's released weights.

Torch->flax key mapping is mechanical thanks to the shared naming
convention (``.N`` sequential indices collapse to ``_N``); value transforms:

  torch                                   flax
  conv weight        [O, I, kh, kw]   ->  kernel [kh, kw, I, O]
  conv-transpose w.  [I, O, kh, kw]   ->  kernel [kh, kw, O, I] (transpose_kernel)
  linear weight      [O, I]           ->  kernel [I, O]
  BN/LN weight       [C]              ->  scale  [C]
  BN running_mean/var                 ->  batch_stats mean/var
  ChebConv weight    [K+1, 1, I, O]   ->  weight (unchanged)
  probe / biases                          unchanged

The legacy-checkpoint remaps of the reference are applied first
(``pose_net.conv.*`` -> ``pose_net.*``, ``sample_net.*`` ->
``sample_nets.0.*``; reference: src/eval.py:15-52).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

LEGACY_REMAPS = (
    (re.compile(r"^(model\.)"), ""),
    (re.compile(r"^pose_net\.conv\."), "pose_net."),
    (re.compile(r"^sample_net\."), "sample_nets.0."),
)

# flat-name joins for modules whose flax params are flat where torch nests
# (hourglass Residual/Merge wrappers: their Conv sub-wrapper adds a .conv
# level that flax doesn't have)
_FLAT_JOINS = (
    (re.compile(r"\.(conv1|conv2|conv3|skip_layer)\.conv\."), r".\1_conv."),
    (re.compile(r"\.conv\.conv\."), r".conv."),
)


def _merge_numeric_segments(key: str) -> list[str]:
    out: list[str] = []
    for seg in key.split("."):
        if seg.isdigit() and out:
            out[-1] = f"{out[-1]}_{seg}"
        else:
            out.append(seg)
    return out


def convert_torch_state_dict(state_dict: Mapping[str, Any]) -> dict:
    """Convert a torch state_dict (tensors or ndarrays) into flax variables
    {"params": ..., "batch_stats": ...}.

    One permutation covers every conv family: torch Conv2d stores [O, I, kh,
    kw] -> flax HWIO via (2,3,1,0), and torch ConvTranspose2d stores
    [I, O, kh, kw] -> the SAME (2,3,1,0) because flax ConvTranspose with
    transpose_kernel semantics swaps I/O (the resnet18/34 pose_net upsample
    stack is the only transposed conv in this model family).
    """
    variables: dict = {"params": {}, "batch_stats": {}}

    for key, value in state_dict.items():
        # copy: .numpy() on a CPU tensor aliases torch storage, so a later
        # in-place torch update (optimizer.step) would silently mutate the
        # converted tree
        v = (
            np.array(value.detach().cpu().numpy())
            if hasattr(value, "detach")
            else np.array(value)
        )
        for pat, repl in LEGACY_REMAPS:
            key = pat.sub(repl, key)
        norm_key = "." + key
        for pat, repl in _FLAT_JOINS:
            norm_key = pat.sub(repl, norm_key)
        segs = _merge_numeric_segments(norm_key.lstrip("."))
        path, leaf = tuple(segs[:-1]), segs[-1]
        path_str = ".".join(path)
        is_cheb = any("gcn" in p or "cheb" in p for p in path)

        if leaf == "num_batches_tracked":
            continue
        if leaf == "running_mean":
            coll, out_path, arr = "batch_stats", path + ("mean",), v
        elif leaf == "running_var":
            coll, out_path, arr = "batch_stats", path + ("var",), v
        elif leaf == "weight":
            if v.ndim == 4 and is_cheb:
                coll, out_path, arr = "params", path + ("weight",), v
            elif v.ndim == 4:
                # Conv2d [O,I,kh,kw] AND ConvTranspose2d [I,O,kh,kw] -> HWIO
                coll, out_path, arr = "params", path + ("kernel",), np.transpose(v, (2, 3, 1, 0))
            elif v.ndim == 2:
                coll, out_path, arr = "params", path + ("kernel",), np.transpose(v, (1, 0))
            else:
                coll, out_path, arr = "params", path + ("scale",), v
        else:  # bias, probe, anything else
            coll, out_path, arr = "params", path + (leaf,), v

        _set_nested(variables[coll], out_path, np.asarray(arr))

    if not variables["batch_stats"]:
        variables.pop("batch_stats")
    return variables


def _set_nested(tree: dict, path: tuple[str, ...], value: Any) -> None:
    node = tree
    for seg in path[:-1]:
        node = node.setdefault(seg, {})
    node[path[-1]] = value


def flatten_tree(tree: Mapping, prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], Any]:
    flat = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            flat.update(flatten_tree(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def assert_trees_match(expected: Mapping, got: Mapping, where: str = "") -> None:
    """Raise with a readable diff if param structures/shapes mismatch."""
    fe, fg = flatten_tree(expected), flatten_tree(got)
    missing = sorted(set(fe) - set(fg))
    extra = sorted(set(fg) - set(fe))
    msgs = []
    if missing:
        msgs.append(f"missing in converted ({len(missing)}): {missing[:8]}")
    if extra:
        msgs.append(f"unexpected in converted ({len(extra)}): {extra[:8]}")
    for path in set(fe) & set(fg):
        se, sg = np.shape(fe[path]), np.shape(fg[path])
        if se != sg:
            msgs.append(f"shape mismatch at {'/'.join(path)}: expected {se}, got {sg}")
    if msgs:
        raise ValueError(f"checkpoint conversion mismatch {where}:\n" + "\n".join(msgs))


# ---------------------------------------------------------------------------
# Orbax native checkpointing
# ---------------------------------------------------------------------------

def save_checkpoint(path, state) -> None:
    import orbax.checkpoint as ocp
    from pathlib import Path

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(Path(path).absolute(), state, force=True)
    ckpt.wait_until_finished()


def restore_checkpoint(path, template):
    import orbax.checkpoint as ocp
    from pathlib import Path

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(Path(path).absolute(), template)
