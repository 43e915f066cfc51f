"""HRNet-v2 backbone (w40/w64), NHWC flax.

Topology per reference src/models/backbones/hrnet.py:430-498:
  stem (2x stride-2 3x3 conv+BN+ReLU) ->
  layer1: 4 Bottleneck @64 (out 256ch) ->
  transition1 -> stage2: 1 module, 2 branches, 4 BasicBlocks each ->
  transition2 -> stage3: 4 modules, 3 branches ->
  transition3 -> stage4: 3 modules, 4 branches; SUM fuse everywhere.
Returns the 4 multi-scale maps [B,{w,2w,4w,8w},{64,32,16,8}^2] (NHWC).

Fuse layers: j>i upsample path = 1x1 conv + BN + nearest 2^(j-i) upsample;
j<i downsample path = (i-j) stride-2 3x3 conv+BN (+ReLU except last)
(hrnet.py:164-199). Module names mirror torch paths with .N -> _N.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from handmvnet_tpu.models.layers import batch_norm, conv
from handmvnet_tpu.models.backbones.resnet import BasicBlock, Bottleneck

_WIDTHS = {"w40": (40, 80, 160, 320), "w64": (64, 128, 256, 512)}
# (num_modules, num_branches) for stages 2..4; 4 BasicBlocks per branch
_STAGES = ((1, 2), (4, 3), (3, 4))


def _nearest_upsample(x: jax.Array, factor: int) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, factor, w, factor, c)
    )
    return x.reshape(b, h * factor, w * factor, c)


class HRModule(nn.Module):
    """One HighResolutionModule: per-branch residual chains + full fuse.

    ``packed`` (eval-time only): the fuse lattice's many narrow convs are
    executed as a few wide ones — on the MXU a conv with 40 output channels
    costs nearly the same as one with 128+ (lanes are padded), so convs that
    share a source tensor are grouped into one conv with concatenated
    kernels, with the eval-mode BN affine folded into kernel+bias, and the
    deeper downsample levels packed block-diagonally. Exact same math
    (parity-tested); parameters/checkpoints are untouched — packing happens
    at apply time from the standard param tree.
    """

    num_branches: int
    channels: Sequence[int]
    num_blocks: int = 4
    remat: bool = False
    packed: bool = True
    # eval-time batch->channel packing of the narrow branch convs (see
    # _branch_grouped). Default OFF until BRANCH_PACKING_PROBE.json shows
    # XLA's TPU lowering runs grouped convs at native lane width (ROADMAP
    # item 5 ledger) — if it densifies them, this pays B x the MACs.
    branch_grouped: bool = False

    @nn.compact
    def __call__(self, xs: list[jax.Array], train: bool = False) -> list[jax.Array]:
        bn_eval = not train
        block_cls = (
            nn.remat(BasicBlock, static_argnums=(2,)) if self.remat else BasicBlock
        )
        use_grouped = (
            self.branch_grouped and not train and not self.is_initializing()
        )
        outs = []
        for i in range(self.num_branches):
            h = xs[i]
            # grouped packing only helps lane-underfilled widths (< 128)
            if use_grouped and self.channels[i] < 128:
                h = self._branch_grouped(h, i)
            else:
                for b in range(self.num_blocks):
                    h = block_cls(
                        planes=self.channels[i], stride=1, has_downsample=False,
                        name=f"branches_{i}_{b}",
                    )(h, train)
            outs.append(h)

        if self.packed and not train and not self.is_initializing():
            return self._fuse_packed(outs)

        fused = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                if j == i:
                    y = outs[j]
                elif j > i:
                    y = conv(self.channels[i], 1, 1, padding=0,
                             name=f"fuse_layers_{i}_{j}_0")(outs[j])
                    y = batch_norm(f"fuse_layers_{i}_{j}_1", y.dtype)(
                        y, use_running_average=bn_eval)
                    y = _nearest_upsample(y, 2 ** (j - i))
                else:
                    y = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.channels[i] if last else self.channels[j]
                        y = conv(out_ch, 3, 2, name=f"fuse_layers_{i}_{j}_{k}_0")(y)
                        y = batch_norm(f"fuse_layers_{i}_{j}_{k}_1", y.dtype)(
                            y, use_running_average=bn_eval)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused

    def _folded(self, conv_name: str, bn_name: str, root: str | None = None,
                ftype=jnp.float32):
        """Conv kernel + bias with the eval-mode BN affine folded in.

        ``root`` selects a param/stat subtree (e.g. a branch block name).
        ``ftype`` is the fold dtype — callers pass
        ``jnp.promote_types(x.dtype, jnp.float32)`` so low precisions fold
        at >= f32 while f64 parity runs stay f64 (never downcast,
        CLAUDE.md dtype rule)."""
        from handmvnet_tpu.models.layers import BN_EPS

        p = self.variables["params"]
        st = self.variables["batch_stats"]
        if root is not None:
            p = p[root]
            st = st[root]
        k = jnp.asarray(p[conv_name]["kernel"], ftype)
        g = jnp.asarray(p[bn_name]["scale"], ftype)
        b = jnp.asarray(p[bn_name]["bias"], ftype)
        m = jnp.asarray(st[bn_name]["mean"], ftype)
        v = jnp.asarray(st[bn_name]["var"], ftype)
        s = g * jax.lax.rsqrt(v + BN_EPS)
        return k * s, b - m * s

    def _branch_grouped(self, h: jax.Array, i: int) -> jax.Array:
        """Branch i's 4 BasicBlocks with the batch folded into channels.

        A 40/80-out-channel conv fills 40/128 of the MXU's output lanes; the
        batch dim (b*v — 8 at the 8-view protocol) is spare parallelism that
        CAN fill them: [B,H,W,C] -> [1,H,W,B*C] with one grouped conv per
        original conv (feature_group_count=B, every group sharing the same
        folded kernel). Exactly the same math as the BasicBlock chain in eval
        mode (BN affine folded into kernel+bias; parity-tested) — whether it
        is FASTER is a pure XLA-lowering question measured on-chip by
        scripts/probe_branch_packing.py. Eval-only, apply-time; params and
        checkpoints untouched.
        """
        B, H, W, C = h.shape
        dtype = h.dtype
        ftype = jnp.promote_types(dtype, jnp.float32)
        dn = ("NHWC", "HWIO", "NHWC")

        def folded(blk: str, conv_name: str, bn_name: str):
            k, b_ = self._folded(conv_name, bn_name, root=blk, ftype=ftype)
            # tile over groups: every group (= batch element) uses the same
            # weights, so kernel [3,3,C,C] -> [3,3,C,B*C], bias [C] -> [B*C]
            return (
                jnp.tile(k, (1, 1, 1, B)).astype(dtype),
                jnp.tile(b_, (B,)).astype(dtype),
            )

        # [B,H,W,C] -> [1,H,W,B*C], batch-major channel blocks (group g of
        # the grouped conv sees exactly batch element g's channels)
        xg = jnp.transpose(h, (1, 2, 0, 3)).reshape(1, H, W, B * C)
        pad = ((1, 1), (1, 1))
        for b in range(self.num_blocks):
            blk = f"branches_{i}_{b}"
            k1, b1 = folded(blk, "conv1", "bn1")
            k2, b2 = folded(blk, "conv2", "bn2")
            y = jax.lax.conv_general_dilated(
                xg, k1, (1, 1), pad, dimension_numbers=dn,
                feature_group_count=B) + b1
            y = nn.relu(y)
            y = jax.lax.conv_general_dilated(
                y, k2, (1, 1), pad, dimension_numbers=dn,
                feature_group_count=B) + b2
            xg = nn.relu(y + xg)
        return jnp.transpose(xg.reshape(H, W, B, C), (2, 0, 1, 3))

    def _fuse_packed(self, outs: list[jax.Array]) -> list[jax.Array]:
        n = self.num_branches
        dn = ("NHWC", "HWIO", "NHWC")
        dtype = outs[0].dtype
        ftype = jnp.promote_types(dtype, jnp.float32)
        contrib: dict[int, list[jax.Array]] = {i: [] for i in range(n)}

        # upsample paths, grouped by source j: ONE 1x1 conv per source with
        # concatenated (BN-folded) kernels, then split + nearest-upsample
        for j in range(1, n):
            kers, biases = zip(*(
                self._folded(f"fuse_layers_{i}_{j}_0", f"fuse_layers_{i}_{j}_1",
                             ftype=ftype)
                for i in range(j)
            ))
            kcat = jnp.concatenate(kers, axis=-1).astype(dtype)
            bcat = jnp.concatenate(biases, axis=-1).astype(dtype)
            y = jax.lax.conv_general_dilated(
                outs[j], kcat, (1, 1), "VALID", dimension_numbers=dn) + bcat
            off = 0
            for i in range(j):
                c = self.channels[i]
                contrib[i].append(_nearest_upsample(y[..., off:off + c], 2 ** (j - i)))
                off += c

        # downsample chains, level-synchronous per source j: level k applies
        # every chain's k-th stride-2 conv in one packed conv. Level 0 convs
        # share the source tensor (plain kernel concat); deeper levels take
        # the previous packed output, so their kernels go in block-diagonal
        # (each chain reads only its own slice).
        for j in range(n - 1):
            targets = list(range(j + 1, n))  # chain for target i has i-j convs
            cur = outs[j]
            # live[i] = (start, width) slice of `cur` holding chain i's input
            live = {i: (0, cur.shape[-1]) for i in targets}
            level = 0
            while live:
                finished = [i for i in live if i - j - 1 == level]
                running = [i for i in live if i - j - 1 > level]
                order = finished + running
                kers, biases, widths, relus = [], [], [], []
                in_ch = cur.shape[-1]
                for i in order:
                    last = i in finished
                    k, b = self._folded(
                        f"fuse_layers_{i}_{j}_{level}_0",
                        f"fuse_layers_{i}_{j}_{level}_1",
                        ftype=ftype,
                    )

                    if live[i] != (0, in_ch):
                        # block-diagonal placement: zero rows outside this
                        # chain's input slice
                        start, _ = live[i]
                        full = jnp.zeros(k.shape[:2] + (in_ch, k.shape[-1]), ftype)
                        k = jax.lax.dynamic_update_slice(
                            full, k, (0, 0, start, 0))
                    kers.append(k)
                    biases.append(b)
                    widths.append(k.shape[-1])
                    relus.append(not last)
                kcat = jnp.concatenate(kers, axis=-1).astype(dtype)
                bcat = jnp.concatenate(biases, axis=-1).astype(dtype)
                y = jax.lax.conv_general_dilated(
                    cur, kcat, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn) + bcat
                off = 0
                new_live = {}
                pieces = []
                for i, w, rl in zip(order, widths, relus):
                    piece = y[..., off:off + w]
                    if not rl:
                        contrib[i].append(piece)  # final conv of chain i (no ReLU)
                    else:
                        piece = nn.relu(piece)
                        new_live[i] = (sum(p.shape[-1] for p in pieces), w)
                        pieces.append(piece)
                    off += w
                if pieces:
                    cur = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=-1)
                    # slices recorded against the concatenated `cur`
                live = new_live
                level += 1

        fused = []
        for i in range(n):
            acc = outs[i]
            for y in contrib[i]:
                acc = acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNetBackbone(nn.Module):
    """Input [B, 256, 256, 3] -> list of 4 maps (64^2..8^2)."""

    width: str = "w40"
    remat: bool = False  # rematerialize branch blocks in backward
    packed: bool = True  # packed fuse lattice at eval time (see HRModule)
    branch_grouped: bool = False  # eval-time grouped branch convs (HRModule)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> list[jax.Array]:
        bn_eval = not train
        widths = _WIDTHS[self.width]

        h = conv(64, 3, 2, name="conv1")(x)
        h = batch_norm("bn1", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)
        h = conv(64, 3, 2, name="conv2")(h)
        h = batch_norm("bn2", x.dtype)(h, use_running_average=bn_eval)
        h = nn.relu(h)

        # layer1: 4 bottlenecks planes=64 -> 256 channels out
        for b in range(4):
            h = Bottleneck(planes=64, stride=1, has_downsample=(b == 0),
                           name=f"layer1_{b}")(h, train=train)

        # transition1: branch0 3x3 conv 256->w (torch transition1.0.{0,1}),
        # branch1 stride-2 3x3 256->2w (torch transition1.1.0.{0,1})
        xs = []
        for i in range(2):
            stride = 1 if i == 0 else 2
            prefix = f"transition1_{i}" if i == 0 else f"transition1_{i}_0"
            y = conv(widths[i], 3, stride, name=f"{prefix}_0")(h)
            y = batch_norm(f"{prefix}_1", y.dtype)(y, use_running_average=bn_eval)
            xs.append(nn.relu(y))

        num_branches_per_stage = (2, 3, 4)
        for stage_idx, (num_modules, num_branches) in enumerate(_STAGES):
            stage_no = stage_idx + 2
            if stage_idx > 0:
                # transitionN: existing branches pass through (channels equal);
                # the new branch downsamples from the last existing one
                new_i = num_branches - 1
                y = conv(widths[new_i], 3, 2,
                         name=f"transition{stage_no - 1}_{new_i}_0_0")(xs[-1])
                y = batch_norm(f"transition{stage_no - 1}_{new_i}_0_1", y.dtype)(
                    y, use_running_average=bn_eval)
                xs = xs + [nn.relu(y)]
            for m in range(num_modules):
                xs = HRModule(
                    num_branches=num_branches,
                    channels=widths[:num_branches],
                    remat=self.remat,
                    packed=self.packed,
                    branch_grouped=self.branch_grouped,
                    name=f"stage{stage_no}_{m}",
                )(xs, train=train)
        return xs
