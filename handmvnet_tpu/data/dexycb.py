"""DexYCB-MV dataset module.

The reference imports a DexYCBDataModule but ships no implementation
(reference train.py:8 / README.md:56 To-Do). This module implements the
contract established by the reference's notebooks and configs: 8 camera
views (selected_views 0..7), root camera index 2, same tar sample schema as
HO3D (notebooks/infer_vis.ipynb cell 2; SURVEY.md §2.2), 640x480 RealSense
frames (constants.py camera serials).
"""

from __future__ import annotations

from handmvnet_tpu.data.ho3d import MultiviewTarDataset


class DexYCBDataset(MultiviewTarDataset):
    name = "dexycb"
    total_views = 8
    root_idx = 2
    input_res = (480, 640)
    train_pattern = "DexYCB_mv_train-{000000..000099}.tar"
    test_pattern = "DexYCB_mv_test-{000000..000019}.tar"
    # epoch sizes from the released checkpoint's step count: 60702 steps at
    # epoch 150 with bs 2 x accum 2 -> ~1618 steps/epoch -> ~6473 samples/GPU
    split_sizes = {"train": 25588, "train+val": 28935, "val": 3347, "test": 4950}
