"""DexYCB-MV / MVHand dataset modules (absent upstream; contract from the
reference notebooks: 8 views root_idx=2 / 4 views root_idx=3, same tar
schema; SURVEY.md §2.2)."""

import numpy as np
import pytest

from handmvnet_tpu.config import DataConfig
from handmvnet_tpu.data.dexycb import DexYCBDataset
from handmvnet_tpu.data.mvhand import MVHandDataset
from handmvnet_tpu.data.synthetic import write_synthetic_ho3d_shards


def write_shards(tmp, prefix, num_views):
    """Reuse the HO3D-format generator, renamed to each dataset's pattern."""
    paths = write_synthetic_ho3d_shards(
        tmp, num_shards=3, samples_per_shard=2, num_views=num_views, split="train"
    )
    out = []
    for p in paths:
        target = p.replace("HO3D_mv", f"{prefix}_mv")
        import os

        os.rename(p, target)
        out.append(target)
    write_test = write_synthetic_ho3d_shards(
        tmp, num_shards=3, samples_per_shard=2, num_views=num_views, split="test", seed=5
    )
    for p in write_test:
        import os

        os.rename(p, p.replace("HO3D_mv", f"{prefix}_mv"))
    return out


class TestDexYCB:
    def test_iterates_with_root_idx_2(self, tmp_path):
        write_shards(tmp_path, "DexYCB", num_views=8)

        class DS(DexYCBDataset):
            train_pattern = "DexYCB_mv_train-{000000..000002}.tar"
            test_pattern = "DexYCB_mv_test-{000000..000002}.tar"

        cfg = DataConfig(name="dexycb", dataset_dir=str(tmp_path),
                         selected_views=tuple(range(8)))
        ds = DS(cfg, "test")
        assert ds.root_idx == 2
        sample = next(iter(ds))
        assert sample["full_rgb"].shape == (8, 480, 640, 3)
        assert sample["joints_cam"].shape == (21, 3)
        # root-relative against VIEW 2's wrist
        np.testing.assert_allclose(
            sample["root_joint"], sample["all_root_joints"][2], atol=1e-4
        )


class TestMVHand:
    def test_iterates_with_root_idx_3(self, tmp_path):
        write_shards(tmp_path, "MVHand", num_views=4)

        class DS(MVHandDataset):
            train_pattern = "MVHand_mv_train-{000000..000002}.tar"
            test_pattern = "MVHand_mv_test-{000000..000002}.tar"

        cfg = DataConfig(name="mvhand", dataset_dir=str(tmp_path),
                         selected_views=tuple(range(4)))
        ds = DS(cfg, "test")
        assert ds.root_idx == 3
        sample = next(iter(ds))
        assert sample["full_rgb"].shape == (4, 480, 640, 3)
        np.testing.assert_allclose(
            sample["root_joint"], sample["all_root_joints"][3], atol=1e-4
        )
