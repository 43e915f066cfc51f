"""Stage-level timing breakdown of the HRNet flagship forward on TPU."""
import sys; sys.path.insert(0, ".")
import dataclasses, time
import jax, jax.numpy as jnp
from handmvnet_tpu.config import Config
from handmvnet_tpu.models import HandMvNet
from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone
from handmvnet_tpu.data.synthetic import synthetic_batch
from bench import _random_variables

cfg = Config.from_yaml("configs/release/HO3D_HandMvNet_HR.yaml")
cfg = cfg.replace(model=dataclasses.replace(cfg.model, selected_views=tuple(range(8))))
batch = synthetic_batch(batch_size=1, num_views=8, with_heatmaps=False, seed=0)
rgb = jnp.asarray(batch["rgb"], jnp.bfloat16)
bboxes = jnp.asarray(batch["bboxes"]); intr = jnp.asarray(batch["intrinsic"])

def timeit(fn, *args, iters=300, chunk=100):
    c = jax.jit(fn).lower(*args).compile()
    r = c(*args); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); done = 0
        while done < iters:
            for _ in range(chunk): r = c(*args)
            jax.block_until_ready(r); done += chunk
        best = min(best, (time.perf_counter()-t0)/iters)
    return best*1e3

model = HandMvNet(cfg=cfg.model)
variables = _random_variables(model, 1, rgb, bboxes, intr)
variables = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, variables)
def full(v, r, b, i): return model.apply(v, r, b, i)["joints_cam"]
print(f"full model (no mesh): {timeit(full, variables, rgb, bboxes, intr):.3f} ms", flush=True)

bb = HRNetBackbone(width=cfg.model.backbone_type)
xv = rgb.reshape((8,) + rgb.shape[2:])
bvars = _random_variables(bb, 2, xv)
bvars = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, bvars)
def bonly(v, x): return bb.apply(v, x)[0]
print(f"backbone only: {timeit(bonly, bvars, xv):.3f} ms", flush=True)

# per-module scaling: time truncated backbones
from handmvnet_tpu.models.layers import batch_norm, conv
from flax import linen as nn
from handmvnet_tpu.models.backbones.resnet import Bottleneck
from handmvnet_tpu.models.backbones.hrnet import HRModule, _WIDTHS, _STAGES

class Trunc(nn.Module):
    width: str = "w40"
    upto: int = 0   # 0=stem+layer1, 1=+stage2, 2=+stage3, 3=+stage4
    @nn.compact
    def __call__(self, x, train=False):
        bn_eval = True
        widths = _WIDTHS[self.width]
        h = conv(64, 3, 2, name="conv1")(x)
        h = batch_norm("bn1", x.dtype)(h, use_running_average=bn_eval); h = nn.relu(h)
        h = conv(64, 3, 2, name="conv2")(h)
        h = batch_norm("bn2", x.dtype)(h, use_running_average=bn_eval); h = nn.relu(h)
        for b in range(4):
            h = Bottleneck(planes=64, stride=1, has_downsample=(b == 0), name=f"layer1_{b}")(h, train=train)
        if self.upto == 0: return h
        xs = []
        for i in range(2):
            stride = 1 if i == 0 else 2
            prefix = f"transition1_{i}" if i == 0 else f"transition1_{i}_0"
            y = conv(widths[i], 3, stride, name=f"{prefix}_0")(h)
            y = batch_norm(f"{prefix}_1", y.dtype)(y, use_running_average=bn_eval)
            xs.append(nn.relu(y))
        for stage_idx, (num_modules, num_branches) in enumerate(_STAGES):
            if stage_idx + 1 > self.upto: break
            stage_no = stage_idx + 2
            if stage_idx > 0:
                new_i = num_branches - 1
                y = conv(widths[new_i], 3, 2, name=f"transition{stage_no-1}_{new_i}_0_0")(xs[-1])
                y = batch_norm(f"transition{stage_no-1}_{new_i}_0_1", y.dtype)(y, use_running_average=bn_eval)
                xs = xs + [nn.relu(y)]
            for m in range(num_modules):
                xs = HRModule(num_branches=num_branches, channels=widths[:num_branches],
                              name=f"stage{stage_no}_{m}")(xs, train=train)
        return xs[0]

for upto, label in ((0, "stem+layer1"), (1, "+stage2 (1 mod)"), (2, "+stage3 (4 mods)"), (3, "+stage4 (3 mods)")):
    t = Trunc(width=cfg.model.backbone_type, upto=upto)
    tv = _random_variables(t, 3, xv)
    tv = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, tv)
    def tf(v, x, _t=t): return _t.apply(v, x)
    print(f"{label}: {timeit(tf, tv, xv):.3f} ms", flush=True)
