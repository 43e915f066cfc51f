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


class TestMeshRasterizer:
    """First-party z-buffer rasterizer (replaces the reference's pyrender)."""

    def _square(self, z):
        # unit square centered on the optical axis at depth z
        v = np.array([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], float)
        f = np.array([[0, 1, 2], [0, 2, 3]])
        return v, f

    def test_depth_and_coverage(self):
        from handmvnet_tpu.vis.mesh_render import rasterize_mesh

        v, f = self._square(5.0)
        rgb, depth = rasterize_mesh(v, f, np.array([32, 32, 32, 32]), 64, 64)
        # center pixel: on the square, depth == 5
        assert depth[32, 32] == np.float32(5.0)
        assert rgb[32, 32].sum() > 0
        # corner pixel: off the square (projected half-width = 32/5 px)
        assert depth[1, 1] == 0.0

    def test_zbuffer_occlusion(self):
        from handmvnet_tpu.vis.mesh_render import rasterize_mesh

        v1, f1 = self._square(5.0)
        v2, f2 = self._square(2.0)  # nearer, smaller on screen? no: larger
        v = np.concatenate([v1, v2])
        f = np.concatenate([f1, f2 + 4])
        _, depth = rasterize_mesh(v, f, np.array([32, 32, 32, 32]), 64, 64)
        assert depth[32, 32] == np.float32(2.0)  # nearer surface wins

    def test_behind_camera_skipped(self):
        from handmvnet_tpu.vis.mesh_render import rasterize_mesh

        v, f = self._square(-3.0)
        rgb, depth = rasterize_mesh(v, f, np.array([32, 32, 32, 32]), 64, 64)
        assert depth.max() == 0.0 and rgb.sum() == 0

    def test_render_on_image_blends_by_mask(self):
        from handmvnet_tpu.vis.mesh_render import render_mesh_on_image

        v, f = self._square(5.0)
        bg = np.full((64, 64, 3), 7, np.uint8)
        blended, depth = render_mesh_on_image(bg, v, f, np.array([32, 32, 32, 32]))
        assert (blended[depth == 0] == 7).all()  # background untouched
        assert (blended[depth > 0] != 7).any()   # mesh visible


class TestMeshPanels:
    def make_mesh_batch(self):
        """Batch whose 'vertices' are a plausible MANO surface (template +
        root) instead of noise, so mesh panels have real structure."""
        from handmvnet_tpu.models.mano import synthetic_mano_model

        b = make_vis_batch()
        m = synthetic_mano_model()
        b["vertices"] = np.repeat(
            (m.v_template * 1000.0 - m.v_template.mean(0) * 1000.0)[None],
            1, axis=0,
        ).astype(np.float32)
        # geometry consistent with the 160x120 fabricated frames: view 0 is
        # the root camera, hand centered 300 mm in front of it
        b["intrinsic"] = np.tile(
            np.array([120.0, 120.0, 80.0, 60.0], np.float32), (1, 3, 1)
        )
        b["extrinsic"] = np.tile(np.eye(4, dtype=np.float32), (1, 3, 1, 1))
        b["root_joint"] = np.array([[[0.0, 0.0, 300.0]]], np.float32)
        return b

    def test_closed_fist_faces(self):
        from handmvnet_tpu.constants import MANO_CLOSED_FIST_FACES, close_mano_faces

        base = np.zeros((776, 3), np.int32)
        closed = close_mano_faces(base)
        assert closed.shape == (776 + 14, 3)
        assert len(MANO_CLOSED_FIST_FACES) == 14
        assert closed[-14:].max() < 778  # valid MANO vertex ids

    def test_mesh_on_image(self):
        b = self.make_mesh_batch()
        vis = HandPoseVisualizer(b)
        bg = vis.visualize_full_rgb_image()
        out = vis.visualize_mesh_on_image()
        assert out.shape == bg.shape
        assert (out != bg).any()  # some mesh pixels composited

    def test_vertices_wireframe_panel(self):
        b = self.make_mesh_batch()
        vis = HandPoseVisualizer(b)
        out = vis.visualize_vertices_wireframe_on_full_image()
        assert out.ndim == 3
        # white wireframe pixels exist
        assert (out == 255).all(axis=-1).any()

    def test_pred_vs_gt_3d(self):
        rng = np.random.default_rng(0)
        pred = rng.normal(size=(21, 3)).astype(np.float32)
        gt = pred + 0.1
        img = HandPoseVisualizer.plot_joints_3d_predictions(pred, gt)
        assert img.ndim == 3 and img.shape[0] > 100

    def test_3d_mesh_card(self):
        b = self.make_mesh_batch()
        vis = HandPoseVisualizer(b)
        card = vis.visualize_3d_mesh(b["vertices"][0])
        assert card.shape == (256, 256, 3)
        assert (card != 255).any()  # mesh rendered
        # offset GT must remain visible next to pred (shared normalization)
        card2 = vis.visualize_3d_mesh(b["vertices"][0], b["vertices"][0] + 80.0)
        assert (card2 != card).any()
