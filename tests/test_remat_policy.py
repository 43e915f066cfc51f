"""The production remat policy (parallel.resolve_remat).

TRAIN_REMAT_PROBE.json measured the release recipes remat-FREE as both
fitting one v5e (compiler memory plan 6.85 GB resnet at bs16 x v5 bf16)
and ~24% faster; "auto" must keep remat off exactly up to the measured
per-device image count and re-enable it beyond (untested => memory-safe).
"""

import dataclasses

import pytest

from handmvnet_tpu.config import Config
from handmvnet_tpu.parallel import resolve_remat


def _cfg(batch=16, views=5, dtype="bfloat16", backbone="resnet", remat="auto"):
    cfg = Config.from_yaml("configs/release/HO3D_HandMvNet.yaml")
    return cfg.replace(
        data=dataclasses.replace(
            cfg.data, batch_size=batch, selected_views=tuple(range(views))
        ),
        model=dataclasses.replace(cfg.model, backbone=backbone),
        train=dataclasses.replace(
            cfg.train, compute_dtype=dtype, remat=remat
        ),
    )


def test_release_recipe_is_remat_free():
    # the measured anchor itself: bs16 x v5 bf16, one device, no accum
    assert resolve_remat(_cfg(), n_devices=1, accum_steps=1) is False


def test_accumulation_shrinks_the_microbatch():
    # accum=2 halves live activations (probe: 4.02 GB) — still off
    assert resolve_remat(_cfg(), n_devices=1, accum_steps=2) is False


def test_beyond_measured_images_reenables_remat():
    # 32 x 5 = 160 images/device is beyond the measured plan — remat on
    assert resolve_remat(_cfg(batch=32), n_devices=1, accum_steps=1) is True
    # ...but sharding over 2 devices brings it back to the anchor
    assert resolve_remat(_cfg(batch=32), n_devices=2, accum_steps=1) is False


def test_fp32_halves_the_anchor():
    # fp32 activations are 2x the measured bf16 bytes (6.85 -> ~13.7 GB,
    # over the 13.5 GB budget): the same recipe remats under fp32
    assert resolve_remat(_cfg(dtype="float32"), n_devices=1, accum_steps=1) is True
    assert resolve_remat(_cfg(dtype="float32"), n_devices=2, accum_steps=1) is False


def test_forced_on_off_and_validation():
    assert resolve_remat(_cfg(remat="on")) is True
    assert resolve_remat(_cfg(remat="off")) is False
    with pytest.raises(ValueError, match="auto/on/off"):
        resolve_remat(_cfg(remat="sometimes"))


def test_unknown_backbone_defaults_to_remat():
    # no measured anchor => conservative: remat on
    assert resolve_remat(_cfg(backbone="hourglass")) is True


def test_explicit_shapes_override_the_config():
    # bench/trace scripts build synthetic batches whose shapes the YAML
    # doesn't describe; the kwargs must win over cfg.data (the bug was
    # resolve_remat silently reading the YAML's bs16 x v5 while the script
    # measured a different shape)
    cfg = _cfg(batch=16, views=5)  # config says: remat off
    assert resolve_remat(cfg, batch_size=32, num_views=8) is True
    cfg_big = _cfg(batch=64, views=8)  # config says: remat on
    assert resolve_remat(cfg_big, batch_size=8, num_views=5) is False
    # partial override composes with the other cfg field
    assert resolve_remat(cfg, batch_size=32) is True  # 32 x cfg's 5 views
    assert resolve_remat(cfg, num_views=8) is True    # cfg's 16 x 8 views
