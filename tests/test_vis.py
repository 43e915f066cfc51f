"""Smoke tests for visualization (headless cv2/matplotlib)."""

import numpy as np

from handmvnet_tpu.data.synthetic import synthetic_batch
from handmvnet_tpu.vis import HandPoseVisualizer, reverse_transform


def make_vis_batch():
    b = synthetic_batch(batch_size=1, num_views=3, seed=5)
    b["full_rgb"] = (np.random.default_rng(0).uniform(size=(1, 3, 120, 160, 3)) * 255).astype(np.uint8)
    b["joints_img"] = np.random.default_rng(1).uniform(10, 100, size=(1, 3, 21, 2)).astype(np.float32)
    return b


class TestVisualizer:
    def test_reverse_transform_roundtrip(self):
        img = np.random.default_rng(0).uniform(size=(8, 8, 3)).astype(np.float32)
        norm = (img - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
        back = reverse_transform(norm)
        np.testing.assert_allclose(back, (img * 255).astype(np.uint8), atol=1)

    def test_panels(self, tmp_path):
        batch = make_vis_batch()
        vis = HandPoseVisualizer(batch)
        assert vis.visualize_rgb_image().ndim == 3
        assert vis.visualize_full_rgb_image().ndim == 3
        assert vis.visualize_joints_2d_on_cropped_image().ndim == 3
        assert vis.visualize_joints_2d_on_full_image().ndim == 3
        assert vis.visualize_bboxes().ndim == 3
        assert vis.visualize_combined_heatmaps().ndim == 3
        assert vis.visualize_projected_joints_2d_on_full_image().ndim == 3
        assert vis.visualize_projected_vertices_2d_on_full_image().ndim == 3
        batch2 = dict(batch)
        batch2["mask"] = np.random.default_rng(2).uniform(size=(1, 3, 32, 32)).astype(np.float32)
        batch2["depth"] = np.random.default_rng(3).uniform(size=(1, 3, 32, 32)).astype(np.float32)
        vis2 = HandPoseVisualizer(batch2)
        assert vis2.visualize_masks().ndim == 3
        assert vis2.visualize_depths().ndim == 3
        out = vis.visualize_3d_joints(save_path=str(tmp_path / "j3d.png"))
        assert (tmp_path / "j3d.png").exists()

    def test_training_hook_helper(self, tmp_path):
        import cv2

        batch = make_vis_batch()
        canvas = HandPoseVisualizer.plot_images_with_joints(
            batch["rgb"][0], batch["joints_crop_img"][0]
        )
        path = str(tmp_path / "joints2d_0.png")
        cv2.imwrite(path, canvas)
        assert (tmp_path / "joints2d_0.png").exists()
