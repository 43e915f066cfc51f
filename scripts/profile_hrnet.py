"""Decompose HRNet-w40 inference time by stage on the real chip.

Times jitted sub-graphs (stem+layer1, each stage's modules, full backbone,
full model) with the scan-probe methodology (K iterations per dispatch,
scalar read barrier) so the relay's per-RPC turnaround doesn't pollute the
split. Run AFTER any other TPU job has finished — the chip is single-tenant.

Usage: python scripts/profile_hrnet.py [--scan 30] [--calls 6]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scan", type=int, default=30)
    parser.add_argument("--calls", type=int, default=6)
    parser.add_argument("--views", type=int, default=8)
    parser.add_argument("--dtype", default="bfloat16")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from handmvnet_tpu.models.backbones.hrnet import HRModule, HRNetBackbone, _STAGES, _WIDTHS

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    bv = args.views  # batch 1 x views images through the backbone
    widths = _WIDTHS["w40"]

    rng = jax.random.PRNGKey(0)

    def timed_scan(fn, variables, xs_template, label):
        """fn(variables, x) -> pytree; time K sequential applications."""
        K = args.scan

        def scanned(variables, stacked):
            def body(c, x):
                out = fn(variables, x)
                leaf = jax.tree.leaves(out)[0]
                return c, leaf.reshape(-1)[0]
            _, outs = jax.lax.scan(body, 0, stacked)
            return outs

        stacked = jax.tree.map(
            lambda x: jnp.stack([x + i * 1e-3 for i in range(K)]), xs_template
        )
        compiled = jax.jit(scanned).lower(variables, stacked).compile()
        _ = float(compiled(variables, stacked)[0])  # warm + barrier
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.calls):
                res = compiled(variables, stacked)
            _ = float(res[0])
            best = min(best, (time.perf_counter() - t0) / (args.calls * K))
        print(f"{label:28s}: {best * 1e3:7.3f} ms/frame", flush=True)
        return best

    # ---- full backbone
    backbone = HRNetBackbone(width="w40")
    x = (jax.random.normal(rng, (bv, 256, 256, 3), jnp.float32) * 0.3).astype(dtype)
    vb = backbone.init(rng, x, False)
    vb = jax.tree.map(lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, vb)
    t_backbone = timed_scan(
        lambda v, xx: backbone.apply(v, xx, False), vb, x, "full backbone")

    # ---- stem + layer1 (standalone module with the same shapes — timings only)
    from flax import linen as nn
    from handmvnet_tpu.models.backbones.resnet import Bottleneck
    from handmvnet_tpu.models.layers import batch_norm, conv

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = conv(64, 3, 2, name="conv1")(x)
            h = batch_norm("bn1", x.dtype)(h, use_running_average=True)
            h = nn.relu(h)
            h = conv(64, 3, 2, name="conv2")(h)
            h = batch_norm("bn2", x.dtype)(h, use_running_average=True)
            h = nn.relu(h)
            for b in range(4):
                h = Bottleneck(planes=64, stride=1, has_downsample=(b == 0),
                               name=f"layer1_{b}")(h, train=False)
            return h

    stem = Stem()
    vs = stem.init(rng, x)
    vs = jax.tree.map(lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, vs)
    t_stem = timed_scan(lambda v, xx: stem.apply(v, xx), vs, x, "stem + layer1")

    # ---- each stage in isolation (module chains at their real shapes)
    spatial = (64, 32, 16, 8)
    t_stages = []
    for stage_idx, (num_modules, num_branches) in enumerate(_STAGES):
        xs = [
            (jax.random.normal(jax.random.PRNGKey(i), (bv, spatial[i], spatial[i], widths[i]),
                               jnp.float32) * 0.3).astype(dtype)
            for i in range(num_branches)
        ]

        class StageN(nn.Module):
            n_mod: int = num_modules
            n_br: int = num_branches

            @nn.compact
            def __call__(self, xs):
                for m in range(self.n_mod):
                    xs = HRModule(num_branches=self.n_br, channels=widths[:self.n_br],
                                  name=f"m{m}")(list(xs), train=False)
                return xs

        st = StageN()
        vst = st.init(rng, xs)
        vst = jax.tree.map(lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, vst)
        t = timed_scan(lambda v, xx: st.apply(v, xx), vst,
                       tuple(xs), f"stage{stage_idx + 2} ({num_modules} modules)")
        t_stages.append(t)

    print(f"\nsum(parts) = {(t_stem + sum(t_stages)) * 1e3:.3f} ms "
          f"vs full backbone {t_backbone * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
