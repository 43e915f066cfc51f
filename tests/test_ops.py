"""Golden tests: core ops vs torch/numpy oracles.

The oracles re-state the reference semantics inline (soft-argmax, grid_sample,
gaussian stamping, antialias resize) so parity is checked against the actual
torch kernels the reference relies on, not against our own code.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from handmvnet_tpu import constants
from handmvnet_tpu.ops import (
    soft_argmax_2d,
    hard_argmax_2d,
    render_gaussian_heatmaps,
    sample_points_bilinear,
    joints_img_to_crop,
    joints_crop_to_img,
    center_scale_to_box,
    clamp_box,
    centered_coordinates,
    fov_angles,
    similarity_align,
    rigid_align_3pt,
    normalized_adjacency,
    cheb_basis,
    resize_bilinear_antialias,
    crop_resize_normalize,
    reproject_to_views,
    project_points,
    transform_between_cameras,
)


def torch_soft_argmax_2d(heatmap, temperature=1000.0):
    b, j, h, w = heatmap.shape
    hm = heatmap.reshape(b, j, -1)
    hm = F.softmax(hm * temperature, dim=2).reshape(b, j, h, w)
    accu_x = hm.sum(dim=2)
    accu_y = hm.sum(dim=3)
    xi = torch.arange(w, dtype=torch.float32)[None, None, :]
    yi = torch.arange(h, dtype=torch.float32)[None, None, :]
    ex = (accu_x * xi).sum(dim=2, keepdim=True)
    ey = (accu_y * yi).sum(dim=2, keepdim=True)
    return torch.cat((ex, ey), dim=2)


class TestSoftArgmax:
    def test_matches_torch(self, rng):
        hm = rng.normal(size=(3, 21, 32, 32)).astype(np.float32)
        ours = np.asarray(soft_argmax_2d(jnp.asarray(hm)))
        theirs = torch_soft_argmax_2d(torch.from_numpy(hm)).numpy()
        np.testing.assert_allclose(ours, theirs, atol=2e-4)

    def test_peak_location(self):
        hm = np.zeros((1, 1, 32, 32), dtype=np.float32)
        hm[0, 0, 10, 25] = 5.0
        out = np.asarray(soft_argmax_2d(jnp.asarray(hm)))
        np.testing.assert_allclose(out[0, 0], [25.0, 10.0], atol=1e-3)

    def test_hard_argmax(self):
        hm = np.zeros((1, 2, 8, 8), dtype=np.float32)
        hm[0, 0, 3, 5] = 1.0
        # channel 1 stays all zeros -> masked to 0
        out = np.asarray(hard_argmax_2d(jnp.asarray(hm)))
        np.testing.assert_allclose(out[0, 0], [6.0, 4.0])  # 1-indexed convention
        np.testing.assert_allclose(out[0, 1], [0.0, 0.0])


def reference_generate_heatmap(img, pt, sigma):
    """Verbatim semantics of src/datasets/utils.py:86-121."""
    pt = pt.astype(np.int32)
    ul = [int(pt[0] - 3 * sigma), int(pt[1] - 3 * sigma)]
    br = [int(pt[0] + 3 * sigma + 1), int(pt[1] + 3 * sigma + 1)]
    if ul[0] >= img.shape[1] or ul[1] >= img.shape[0] or br[0] < 0 or br[1] < 0:
        return img
    size = 6 * sigma + 1
    x = np.arange(0, size, 1, float)
    y = x[:, np.newaxis]
    x0 = y0 = size // 2
    g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * sigma**2))
    g_x = max(0, -ul[0]), min(br[0], img.shape[1]) - ul[0]
    g_y = max(0, -ul[1]), min(br[1], img.shape[0]) - ul[1]
    img_x = max(0, ul[0]), min(br[0], img.shape[1])
    img_y = max(0, ul[1]), min(br[1], img.shape[0])
    img[img_y[0]:img_y[1], img_x[0]:img_x[1]] = g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return img


class TestGaussianHeatmap:
    @pytest.mark.parametrize("pt", [(128.7, 90.2), (2.0, 2.0), (-3.0, 100.0),
                                    (255.0, 255.0), (-50.0, -50.0), (300.0, 10.0)])
    def test_matches_reference(self, pt):
        oracle = reference_generate_heatmap(np.zeros((256, 256)), np.array(pt), 2)
        ours = np.asarray(
            render_gaussian_heatmaps(jnp.asarray([pt]), 256, 256, sigma=2.0)
        )[0]
        np.testing.assert_allclose(ours, oracle, atol=1e-6)

    def test_batched_shape(self, rng):
        pts = rng.uniform(0, 256, size=(4, 21, 2)).astype(np.float32)
        out = render_gaussian_heatmaps(jnp.asarray(pts), 256, 256)
        assert out.shape == (4, 21, 256, 256)


class TestSamplePoints:
    @pytest.mark.parametrize("hw", [(32, 32), (16, 16), (8, 8), (64, 64)])
    def test_matches_grid_sample(self, rng, hw):
        h, w = hw
        feat = rng.normal(size=(2, 40, h, w)).astype(np.float32)
        # coords in 32x32-heatmap units regardless of map size (the reference quirk)
        pts = rng.uniform(0, 31, size=(2, 21, 2)).astype(np.float32)

        tfeat = torch.from_numpy(feat)
        tpts = torch.from_numpy(pts)
        x = tpts[:, :, 0] / (w - 1) * 2 - 1
        y = tpts[:, :, 1] / (h - 1) * 2 - 1
        grid = torch.stack((x, y), 2)[:, :, None, :]
        oracle = F.grid_sample(tfeat, grid, align_corners=True)[:, :, :, 0]
        oracle = oracle.permute(0, 2, 1).numpy()

        ours = np.asarray(
            sample_points_bilinear(jnp.asarray(feat.transpose(0, 2, 3, 1)), jnp.asarray(pts))
        )
        np.testing.assert_allclose(ours, oracle, atol=1e-5)


class TestGeometry:
    def test_crop_roundtrip(self, rng):
        pts = rng.uniform(0, 640, size=(5, 21, 2)).astype(np.float32)
        boxes = np.stack(
            [np.array([10.0, 20.0, 200.0, 210.0]) + 30 * i for i in range(5)]
        ).astype(np.float32)
        crop = joints_img_to_crop(jnp.asarray(pts), jnp.asarray(boxes))
        back = joints_crop_to_img(crop, jnp.asarray(boxes))
        np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-3)

    def test_crop_matches_reference_formula(self, rng):
        pts = rng.uniform(0, 640, size=(3, 21, 2))
        boxes = np.array([[10, 20, 200, 210], [0, 0, 256, 256], [-5, -5, 100, 100]], dtype=np.float64)
        expect = pts.copy()
        expect -= boxes[:, None, :2]
        expect[:, :, 0] *= 256.0 / (boxes[:, 2] - boxes[:, 0])[:, None]
        expect[:, :, 1] *= 256.0 / (boxes[:, 3] - boxes[:, 1])[:, None]
        got = np.asarray(joints_img_to_crop(jnp.asarray(pts, dtype=jnp.float32),
                                            jnp.asarray(boxes, dtype=jnp.float32)))
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-2)

    def test_center_scale_to_box(self):
        box = np.asarray(center_scale_to_box(jnp.asarray([100.5, 50.5]), jnp.asarray(99.0)))
        # reference: int() truncation of [51.0, 1.0, 150.0, 100.0]
        np.testing.assert_array_equal(box, [51, 1, 150, 100])

    def test_clamp(self):
        out = np.asarray(clamp_box(jnp.asarray([-10, -5, 700, 500]), (480, 640)))
        np.testing.assert_array_equal(out, [0, 0, 640, 480])

    def test_fov_encoding(self, rng):
        pts = rng.uniform(0, 640, size=(4, 5, 2)).astype(np.float32)
        intr = np.abs(rng.normal(size=(4, 4)).astype(np.float32)) * 100 + 500
        cc = centered_coordinates(jnp.asarray(pts), jnp.asarray(intr[:, 2]), jnp.asarray(intr[:, 3]))
        fov = fov_angles(cc, jnp.asarray(intr[:, 0]), jnp.asarray(intr[:, 1]))
        expect_x = np.arctan((pts[..., 0] - intr[:, 2:3]) / intr[:, 0:1])
        np.testing.assert_allclose(np.asarray(fov)[..., 0], expect_x, atol=1e-5)


class TestProcrustes:
    def test_similarity_align_recovers_transform(self, rng):
        s2 = rng.normal(size=(4, 21, 3)).astype(np.float32)
        # random rotation via QR
        q, _ = np.linalg.qr(rng.normal(size=(4, 3, 3)))
        det = np.linalg.det(q)
        q[:, :, 0] *= np.sign(det)[:, None]
        s1 = np.einsum("bij,bnj->bni", q, s2) * 2.5 + rng.normal(size=(4, 1, 3))
        aligned = np.asarray(similarity_align(jnp.asarray(s1.astype(np.float32)), jnp.asarray(s2)))
        np.testing.assert_allclose(aligned, s2, atol=1e-3)

    def test_matches_torch_reference(self, rng):
        s1 = rng.normal(size=(6, 21, 3)).astype(np.float32)
        s2 = (s1 + 0.1 * rng.normal(size=(6, 21, 3))).astype(np.float32)
        ours = np.asarray(similarity_align(jnp.asarray(s1), jnp.asarray(s2)))
        oracle = torch_similarity_transform(torch.from_numpy(s1), torch.from_numpy(s2)).numpy()
        np.testing.assert_allclose(ours, oracle, atol=1e-4)

    def test_rigid_align(self, rng):
        a = rng.normal(size=(3, 5)).astype(np.float64)
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        t = rng.normal(size=(3, 1))
        b = q @ a + t
        r_est, t_est = rigid_align_3pt(jnp.asarray(a, dtype=jnp.float32), jnp.asarray(b, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(r_est), q, atol=1e-4)
        np.testing.assert_allclose(np.asarray(t_est), t, atol=1e-4)


def torch_similarity_transform(S1, S2):
    """Verbatim semantics of src/models/metrics.py:128-176."""
    batch_size = S1.shape[0]
    S1 = S1.permute(0, 2, 1)
    S2 = S2.permute(0, 2, 1)
    mu1 = S1.mean(dim=2, keepdim=True)
    mu2 = S2.mean(dim=2, keepdim=True)
    X1 = S1 - mu1
    X2 = S2 - mu2
    var1 = (X1**2).sum(dim=(1, 2))
    K = torch.matmul(X1, X2.permute(0, 2, 1))
    U, s, V = torch.svd(K)
    Vh = V.permute(0, 2, 1)
    Z = torch.eye(U.shape[1]).unsqueeze(0).repeat(batch_size, 1, 1)
    Z[:, -1, -1] *= torch.sign(torch.linalg.det(torch.matmul(U, Vh)))
    R = torch.matmul(torch.matmul(V, Z), U.permute(0, 2, 1))
    trace = torch.matmul(R, K).diagonal(offset=0, dim1=-1, dim2=-2).sum(dim=-1)
    scale = (trace / var1).unsqueeze(dim=-1).unsqueeze(dim=-1)
    t = mu2 - scale * torch.matmul(R, mu1)
    return (scale * torch.matmul(R, S1) + t).permute(0, 2, 1)


class TestGraph:
    def test_adjacency_matches_reference_pipeline(self):
        import scipy.sparse as sp

        edges = np.array(constants.HAND_EDGES)
        data, i, j = np.ones(edges.shape[0]), edges[:, 0], edges[:, 1]
        adj = sp.coo_matrix((data, (i, j)), shape=(21, 21), dtype=np.float32)
        adj = adj + adj.T.multiply(adj.T > adj) - adj.multiply(adj.T > adj)
        adj = adj + sp.eye(21)
        rowsum = np.array(adj.sum(1)).flatten()
        rinv = np.where(rowsum > 0, 1.0 / rowsum, 0)
        oracle = (sp.diags(rinv).dot(adj)).todense()

        ours = normalized_adjacency(21, constants.HAND_EDGES)
        np.testing.assert_allclose(ours, np.asarray(oracle), atol=1e-6)

    def test_cheb_basis_matches_torch_recurrence(self):
        basis = cheb_basis(21, constants.HAND_EDGES, order=2)
        assert basis.shape == (3, 21, 21)
        graph = torch.from_numpy(normalized_adjacency(21, constants.HAND_EDGES))
        D = torch.diag(torch.sum(graph, dim=-1) ** (-0.5))
        L = torch.eye(21) - D @ graph @ D
        oracle = torch.stack([torch.eye(21), L, 2 * L @ L - torch.eye(21)])
        np.testing.assert_allclose(basis, oracle.numpy(), atol=1e-5)


class TestResize:
    @pytest.mark.parametrize("in_size,out_size", [(256, 32), (480, 256), (10, 256), (64, 64)])
    def test_matches_torch_antialias(self, rng, in_size, out_size):
        img = rng.uniform(size=(3, in_size, in_size)).astype(np.float32)
        oracle = F.interpolate(
            torch.from_numpy(img)[None], size=(out_size, out_size),
            mode="bilinear", antialias=True, align_corners=False,
        )[0].numpy()
        ours = np.asarray(
            resize_bilinear_antialias(jnp.asarray(img), (out_size, out_size))
        )
        np.testing.assert_allclose(ours, oracle, atol=2e-5)

    def test_crop_resize_matches_reference_chain(self, rng):
        """crop_and_pad + ToTensor + Resize(antialias) + Normalize oracle."""
        img = (rng.uniform(size=(480, 640, 3)) * 255).astype(np.uint8)
        for box in ([100, 50, 300, 250], [-20, -10, 180, 190], [500, 300, 700, 500]):
            x1, y1, x2, y2 = box
            # reference crop_and_pad_image (src/datasets/utils.py:40-77)
            canvas = np.zeros((y2 - y1, x2 - x1, 3), dtype=np.uint8)
            sx, sy = max(0, x1), max(0, y1)
            ex, ey = min(640, x2), min(480, y2)
            canvas[sy - y1:ey - y1, sx - x1:ex - x1] = img[sy:ey, sx:ex]
            t = torch.from_numpy(canvas.transpose(2, 0, 1)).float() / 255.0
            t = F.interpolate(t[None], size=(256, 256), mode="bilinear", antialias=True)[0]
            mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
            std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
            oracle = ((t - mean) / std).numpy().transpose(1, 2, 0)

            ours = np.asarray(
                crop_resize_normalize(jnp.asarray(img), jnp.asarray(box), 256)
            )
            np.testing.assert_allclose(ours, oracle, atol=1e-4)


class TestCamera:
    def _random_extrinsics(self, rng, n):
        q, _ = np.linalg.qr(rng.normal(size=(n, 3, 3)))
        det = np.linalg.det(q)
        q[:, :, 0] *= np.sign(det)[:, None]
        t = rng.normal(size=(n, 3)) * 0.3
        ext = np.tile(np.eye(4), (n, 1, 1))
        ext[:, :3, :3] = q
        ext[:, :3, 3] = t
        return ext.astype(np.float32)

    def test_reproject_matches_reference_loop(self, rng):
        b, v = 2, 4
        joints = rng.normal(size=(b, 21, 3)).astype(np.float32) * 0.05
        joints[..., 2] += 0.5
        intr = np.tile(np.array([600.0, 600.0, 320.0, 240.0], dtype=np.float32), (b, v, 1))
        ext = np.stack([self._random_extrinsics(rng, v) for _ in range(b)])

        # oracle: reference's python loop (src/utils/camera.py:25-44)
        oracle = np.zeros((b, v, 21, 2), dtype=np.float32)
        for bi in range(b):
            for vi in range(v):
                tj = np.asarray(
                    transform_between_cameras(
                        jnp.asarray(joints[bi]), jnp.asarray(ext[bi, 0]), jnp.asarray(ext[bi, vi])
                    )
                )
                z = tj[:, 2] * 1000 + 1e-6
                oracle[bi, vi, :, 0] = tj[:, 0] * 1000 * intr[bi, vi, 0] / z + intr[bi, vi, 2]
                oracle[bi, vi, :, 1] = tj[:, 1] * 1000 * intr[bi, vi, 1] / z + intr[bi, vi, 3]

        ours = np.asarray(
            reproject_to_views(jnp.asarray(joints), 0, jnp.asarray(intr), jnp.asarray(ext))
        )
        np.testing.assert_allclose(ours, oracle, rtol=1e-3, atol=5e-2)

    def test_project_unproject_roundtrip(self, rng):
        from handmvnet_tpu.ops import unproject_points

        pts = rng.normal(size=(4, 21, 3)).astype(np.float32)
        pts[..., 2] = np.abs(pts[..., 2]) + 1.0
        intr = np.tile(np.array([600.0, 600.0, 320.0, 240.0], dtype=np.float32), (4, 1))
        uvd = project_points(jnp.asarray(pts), jnp.asarray(intr))
        back = np.asarray(unproject_points(uvd, jnp.asarray(intr)))
        np.testing.assert_allclose(back, pts, atol=1e-3)


class TestFusedHeatmapResize:
    def test_matches_compose_chain(self, rng):
        from handmvnet_tpu.ops.heatmap import render_gaussian_heatmaps_resized

        pts = np.concatenate(
            [
                rng.uniform(-40, 300, size=(3, 21, 2)),
                np.array([[[500.0, 10.0], [-100.0, -100.0]] + [[128.0, 128.0]] * 19]),
            ],
            axis=0,
        ).astype(np.float32)
        full = render_gaussian_heatmaps(jnp.asarray(pts), 256, 256)
        compose = np.asarray(resize_bilinear_antialias(full, (32, 32)))
        fused = np.asarray(render_gaussian_heatmaps_resized(jnp.asarray(pts), 256, 32))
        np.testing.assert_allclose(fused, compose, atol=1e-6)


class TestGeometryExtras:
    def test_points_to_square_box(self, rng):
        from handmvnet_tpu.ops.geometry import points_to_square_box

        pts = rng.uniform(50, 400, size=(21, 2)).astype(np.float32)
        box = np.asarray(points_to_square_box(jnp.asarray(pts)))
        # reference formula (src/datasets/utils.py:5-27)
        x_min, y_min = int(pts[:, 0].min()), int(pts[:, 1].min())
        x_max, y_max = int(pts[:, 0].max()), int(pts[:, 1].max())
        w, h = x_max - x_min, y_max - y_min
        if h != w:
            diff = abs(h - w)
            pad = diff // 2
            if h > w:
                x_min -= pad if diff % 2 == 0 else pad + 1
                x_max += pad
            else:
                y_min -= pad if diff % 2 == 0 else pad + 1
                y_max += pad
        np.testing.assert_array_equal(box, [x_min, y_min, x_max, y_max])
        assert box[2] - box[0] == box[3] - box[1]  # square

    def test_cam_world_roundtrip(self, rng):
        from handmvnet_tpu.ops.camera import cam_to_world, world_to_cam

        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = q * np.sign(np.linalg.det(q))
        ext[:3, 3] = rng.normal(size=3)
        pts = rng.normal(size=(7, 3)).astype(np.float32)
        world = cam_to_world(jnp.asarray(pts), jnp.asarray(ext))
        back = np.asarray(world_to_cam(world, jnp.asarray(ext)))
        np.testing.assert_allclose(back, pts, atol=1e-4)

    def test_intrinsics_matrix(self):
        from handmvnet_tpu.ops.camera import intrinsics_vec_to_matrix

        k = np.asarray(intrinsics_vec_to_matrix(jnp.asarray([600.0, 610.0, 320.0, 240.0])))
        expect = np.array([[600, 0, 320], [0, 610, 240], [0, 0, 1]], dtype=np.float32)
        np.testing.assert_array_equal(k, expect)


class TestTorchBatchNormStats:
    def test_unbiased_running_var_update_matches_torch(self, rng):
        """One train-mode forward: flax stock BatchNorm stores the BIASED
        batch variance into running stats, torch stores the Bessel-corrected
        one — TorchBatchNorm must follow torch exactly (layers.py)."""
        import torch
        import jax
        import jax.numpy as jnp

        from handmvnet_tpu.models.layers import batch_norm

        c = 7
        x = rng.normal(size=(3, 5, 6, c)).astype(np.float32)
        tbn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1).train()
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(rng.normal(size=c).astype(np.float32)))
            tbn.bias.copy_(torch.from_numpy(rng.normal(size=c).astype(np.float32)))
        y_t = tbn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

        bn = batch_norm("bn")
        # applied standalone, the module's own name isn't part of the scope
        variables = {
            "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                       "bias": jnp.asarray(tbn.bias.detach().numpy())},
            "batch_stats": {"mean": jnp.zeros(c), "var": jnp.ones(c)},
        }
        y_j, mut = bn.apply(
            variables, jnp.asarray(x), use_running_average=False,
            mutable=["batch_stats"],
        )
        np.testing.assert_allclose(
            np.asarray(y_j), np.transpose(y_t.detach().numpy(), (0, 2, 3, 1)),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-5,
        )
        # the discriminating assertion: torch's running_var uses n/(n-1)
        np.testing.assert_allclose(
            np.asarray(mut["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-5,
        )
