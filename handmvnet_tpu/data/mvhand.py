"""MVHand dataset module.

Like DexYCB, imported-but-absent upstream (reference train.py:9,
README.md:56 To-Do). Contract from the notebooks: 4 camera views, root
camera index 3, same tar sample schema as HO3D
(notebooks/infer_vis.ipynb cell 2; SURVEY.md §2.2).
"""

from __future__ import annotations

from handmvnet_tpu.data.ho3d import MultiviewTarDataset


class MVHandDataset(MultiviewTarDataset):
    name = "mvhand"
    total_views = 4
    root_idx = 3
    input_res = (480, 640)
    train_pattern = "MVHand_mv_train-{000000..000009}.tar"
    test_pattern = "MVHand_mv_test-{000000..000002}.tar"
    # epoch sizes from the released checkpoint's step count: 23760 steps at
    # epoch 98 with bs 2 x accum 2 -> 240 steps/epoch -> ~960 samples
    split_sizes = {"train": 960, "train+val": 1200, "val": 240, "test": 480}
