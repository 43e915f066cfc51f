"""Bisect the HRNet views=5/batch=8 TPU-worker crash (BENCH_MATRIX rows
19-20: reproduced 3x in round 3, both dtypes, after which the tunneled TPU
degraded and then hung — see ROADMAP round-3 environment note).

Strategy: every probe runs in its OWN subprocess (the failure mode kills the
TPU worker, and with it the host process), so the parent survives to record
ok/crash per probe and write HRNET_V5B8_BISECT.json. Probes bracket the
crash two ways:

  stage axis  — backbone only -> full forward -> forward+mesh ->
                the lax.scan device-throughput probe (bench.py's rgbK scan,
                the round-3 crash site candidate: it materializes K full
                batches on-chip);
  shape axis  — for the first crashing stage, batch {8 -> 6 -> 4} and views
                {5 -> 4 -> 6} variants to find whether a lane/tile-friendly
                padding sidesteps it.

Run (real TPU):  python scripts/bisect_hrnet_v5b8.py
One probe only:  python scripts/bisect_hrnet_v5b8.py --probe full:b8v5:bf16
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

CFG = "configs/release/HO3D_HandMvNet_HR.yaml"

# (stage, batch, views, dtype) — ordered so the cheapest/most isolating run
# first. Stages: backbone | backbone_nopack | tokens | fuse | full | mesh |
# scan10. "tokens"/"fuse" split the full forward at the model's own
# view-parallel seam (HandMvNet stage= kwarg): tokens = backbone + pose_net
# + soft-argmax + SampleNets + encodings; fuse = attention fusion + GCN
# decoder on a synthetic [b, v*21, feat] tensor.
BASE_PROBES = [
    "backbone:b8v5:bf16",
    "backbone_nopack:b8v5:bf16",
    "tokens:b8v5:bf16",
    "fuse:b8v5:bf16",
    "full:b8v5:bf16",
    "mesh:b8v5:bf16",
    "scan10:b8v5:bf16",
    "scan10:b8v5:fp32",
]
SHAPE_VARIANTS = ["b6v5", "b4v5", "b8v4", "b8v6"]


def _parse_probe(spec: str):
    stage, shape, dt = spec.split(":")
    batch = int(shape.split("v")[0][1:])
    views = int(shape.split("v")[1])
    cfg_path = CFG
    if stage.endswith("_wocam"):  # drop the crop-FoV encoding (pos2d+sin only)
        stage = stage[: -len("_wocam")]
        cfg_path = "configs/release/HO3D_HandMvNet_HR_wo_cam.yaml"
    return stage, batch, views, dt, cfg_path


def run_probe(spec: str, platform: str = "") -> None:
    """Child-process body: build the slice, run it once, read one value."""
    import dataclasses

    import jax

    if platform:  # axon ignores JAX_PLATFORMS; only jax.config.update wins
        jax.config.update("jax_platforms", platform)
    import jax.numpy as jnp

    from bench import _random_variables
    from handmvnet_tpu.config import Config

    stage, batch, views, dt, cfg_path = _parse_probe(spec)
    dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32

    cfg = Config.from_yaml(REPO / cfg_path)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, selected_views=tuple(range(views))
    ))

    if stage.startswith("backbone"):
        from handmvnet_tpu.models.backbones.hrnet import HRNetBackbone

        bb = HRNetBackbone(width="w40", packed=not stage.endswith("nopack"))
        x = jnp.zeros((batch * views, 256, 256, 3), dtype)
        variables = _random_variables(bb, 3, x)
        if dtype == jnp.bfloat16:
            variables = jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                variables,
            )
        fn = jax.jit(lambda v, x: bb.apply(v, x)[0])
        res = fn(variables, x)
        print("VALUE", float(res[(0,) * res.ndim]))
        return

    from handmvnet_tpu.data.synthetic import synthetic_batch
    from handmvnet_tpu.models import HandMvNet

    model = HandMvNet(cfg=cfg.model)

    if stage == "fuse":
        # fusion + decoder only, on a synthetic token tensor at the exact
        # shape the full forward produces (HRNet-w40 with-cam: 312 feat)
        feat_dim = (sum(cfg.model.backbone_channels) // 2
                    + (2 if "pos2d" in cfg.model.pos_enc else 0)
                    + (10 if "crop" in cfg.model.pos_enc else 0))
        tokens = (jax.random.normal(
            jax.random.PRNGKey(3), (batch, views * 21, feat_dim),
            jnp.float32) * 0.05).astype(dtype)

        class _FuseInit:  # adapt model.init to the fuse-stage signature
            def init(self, key, t):
                return model.init(key, t, stage="fuse")

        variables = _random_variables(_FuseInit(), 1, tokens)
        if dtype == jnp.bfloat16:
            variables = jax.tree.map(
                lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
                variables,
            )
        fn = jax.jit(lambda v, t: model.apply(v, t, stage="fuse"))
        res = fn(variables, tokens)
        print("VALUE", float(res[(0,) * res.ndim]))
        return
    b = synthetic_batch(batch_size=batch, num_views=views,
                        with_heatmaps=False, seed=0)
    rgb = jnp.asarray(b["rgb"], dtype)
    bboxes = jnp.asarray(b["bboxes"])
    intr = jnp.asarray(b["intrinsic"])
    variables = _random_variables(model, 1, rgb, bboxes, intr)
    if dtype == jnp.bfloat16:
        variables = jax.tree.map(
            lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a,
            variables,
        )

    if stage == "tokens":
        fn = jax.jit(
            lambda v, r, bb, it: model.apply(v, r, bb, it, stage="tokens")["tokens"]
        )
        res = fn(variables, rgb, bboxes, intr)
        print("VALUE", float(res[(0,) * res.ndim]))
        return

    if stage in ("heat", "coords", "sample", "sampletok"):
        # backbone + pose_net head (heat), + soft-argmax (coords), + the
        # per-level SampleNet gathers WITHOUT the pos2d/crop encodings or
        # the [b, v*21, feat] reshape (sample): the increments between the
        # passing "backbone" probe and the crashing "tokens" probe. A
        # subclass overriding __call__ keeps the explicit submodule names,
        # so the full-forward variables resolve.
        from flax import linen as nn

        from handmvnet_tpu.models.nets import SampleNet
        from handmvnet_tpu.ops.heatmap import soft_argmax_2d

        class TrunkSlice(HandMvNet):
            upto: str = "heat"

            @nn.compact
            def __call__(self, xv):  # noqa: D102 - probe-only slice
                feats = self._backbone_features(xv, False)
                hm = self._pose_net(feats[0], False)
                if self.upto == "heat":
                    return hm
                hm_jf = jnp.moveaxis(hm, -1, 1)
                sa_dtype = jnp.promote_types(hm_jf.dtype, jnp.float32)
                coords = soft_argmax_2d(hm_jf.astype(sa_dtype)).astype(xv.dtype)
                if self.upto == "coords":
                    return coords
                sampled = [
                    SampleNet(out_channels=f.shape[-1] // 2,
                              name=f"sample_nets_{i}")(f, coords, train=False)
                    for i, f in enumerate(feats)
                ]
                toks = jnp.concatenate(sampled, axis=-1)
                if self.upto == "sample":
                    return toks
                # sampletok: + the [b*v, j, f] -> [b, v*j, f] batch reshape
                bv, j, fd = toks.shape
                return toks.reshape(bv // views, views * j, fd)

        probe_model = TrunkSlice(cfg=cfg.model, upto=stage)
        xv = rgb.reshape((batch * views,) + rgb.shape[2:])
        fn = jax.jit(lambda v, x: probe_model.apply(v, x))
        res = fn(variables, xv)
        print("VALUE", float(res[(0,) * res.ndim]))
        return

    j2v = None
    if stage in ("mesh", "scan10"):
        from handmvnet_tpu.models.joints_to_vertices import joints_to_vertices_fn
        from handmvnet_tpu.models.mano import ManoLayer, synthetic_mano_model

        j2v = joints_to_vertices_fn(ManoLayer(synthetic_mano_model()))

    def step(variables, rgb, bboxes, intr):
        out = model.apply(variables, rgb, bboxes, intr)
        joints = out["joints_cam"]
        if j2v is not None:
            return joints, j2v(joints * 1000.0)
        return joints, out["joints_crop_img"]

    if stage in ("full", "mesh"):
        res = jax.jit(step)(variables, rgb, bboxes, intr)
        print("VALUE", float(res[0][(0,) * res[0].ndim]))
        return

    assert stage == "scan10", stage
    # the exact bench.py device-throughput probe at K=10
    K = 10
    key = jax.random.PRNGKey(7)
    rgbK = rgb[None] + (jax.random.normal(key, (K,) + rgb.shape, jnp.float32) * 0.01).astype(rgb.dtype)
    bboxesK = jnp.broadcast_to(bboxes, (K,) + bboxes.shape)
    intrK = jnp.broadcast_to(intr, (K,) + intr.shape)

    def scanned(variables, rgbK, bboxesK, intrK):
        def body(carry, xs):
            r, bb, it = xs
            joints, second = step(variables, r, bb, it)
            return carry, (joints[0, 0], second[0, 0])
        _, outs = jax.lax.scan(body, 0, (rgbK, bboxesK, intrK))
        return outs

    sres = jax.jit(scanned)(variables, rgbK, bboxesK, intrK)
    print("VALUE", float(sres[0][(0,) * sres[0].ndim]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--probe", default="", help="run ONE probe in-process")
    parser.add_argument("--timeout", type=float, default=900.0)
    parser.add_argument("--platform", default="",
                        help="force a jax platform (cpu = CI sanity)")
    parser.add_argument("--out", default=str(REPO / "HRNET_V5B8_BISECT.json"))
    args = parser.parse_args()

    if args.probe:
        run_probe(args.probe, args.platform)
        return

    results = []
    first_crash_stage = None
    probes = list(BASE_PROBES)
    done = set()
    while probes:
        spec = probes.pop(0)
        if spec in done:
            continue
        done.add(spec)
        t0 = time.time()
        try:
            cmd = [sys.executable, str(Path(__file__).resolve()),
                   "--probe", spec]
            if args.platform:
                cmd += ["--platform", args.platform]
            proc = subprocess.run(
                cmd, capture_output=True, text=True, timeout=args.timeout,
            )
            ok = proc.returncode == 0 and "VALUE" in proc.stdout
            tail = "" if ok else (proc.stderr or proc.stdout).strip()[-300:]
        except subprocess.TimeoutExpired:
            ok, tail = False, f"hang > {args.timeout:.0f}s"
        row = {"probe": spec, "ok": ok, "wall_s": round(time.time() - t0, 1)}
        if not ok:
            row["tail"] = tail
            # a crashing probe leaves the tunnel degraded (round-3 pattern);
            # wait for a clean health probe so the NEXT probe's verdict is
            # about its shape, not about the dying backend
            if not args.platform:  # skip on forced-CPU sanity runs
                deadline = time.time() + 1800
                while time.time() < deadline:
                    try:
                        hp = subprocess.run(
                            [sys.executable, "-c",
                             "import jax, jax.numpy as jnp; jax.devices();"
                             "x = jnp.ones((128,128), jnp.bfloat16);"
                             "print('OK', float((x@x).sum()))"],
                            capture_output=True, text=True, timeout=180,
                        )
                        if hp.returncode == 0 and "OK" in hp.stdout:
                            break
                    except subprocess.TimeoutExpired:
                        pass
                    time.sleep(60)
                else:
                    row["note"] = "backend did not recover within 30 min"
            stage = spec.split(":")[0]
            if first_crash_stage is None:
                first_crash_stage = stage
                # append shape variants of the first crashing stage
                dt = spec.split(":")[2]
                probes = [f"{stage}:{s}:{dt}" for s in SHAPE_VARIANTS] + probes
        results.append(row)
        print(json.dumps(row), file=sys.stderr)
        Path(args.out).write_text(json.dumps({
            "crash_signature": "hrnet_w40 views=5 batch=8 (BENCH_MATRIX rows 19-20)",
            "first_crash_stage": first_crash_stage,
            "probes": results,
        }, indent=2) + "\n")
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
