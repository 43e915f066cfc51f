"""Shape/finite smoke tests for the dormant-but-spec'd capability surface
(SURVEY.md §2.3/2.4): bisected hourglass, legacy PoseNet head, graph module
zoo, PE variants, ManoDecoder, frequency encoding."""

import numpy as np
import jax
import jax.numpy as jnp


class TestDormantBackbones:
    def test_bisected_hourglass_shapes(self):
        from handmvnet_tpu.models.backbones.hourglass import StackedBisectedHourglass

        m = StackedBisectedHourglass(nstack=2, inp_dim=32, oup_dim=21, recur_hg=2)
        x = jnp.ones((1, 64, 64, 3))
        v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        feats, hm, final, mask = m.apply(v, x)
        assert feats.shape == (1, 8, 8, 32)
        assert hm.shape == (1, 2, 8, 8, 21)
        assert final.shape == (1, 8, 8, 32)
        assert mask.shape == (1, 2, 8, 8, 1)


class TestDormantNets:
    def test_legacy_posenet(self):
        from handmvnet_tpu.models.nets import PoseNet

        m = PoseNet(channels=(64, 21))
        x = jnp.ones((2, 32, 32, 128))
        v = m.init(jax.random.PRNGKey(0), x)
        coords, hm = m.apply(v, x)
        assert coords.shape == (2, 21, 2)
        assert hm.shape == (2, 21, 32, 32)
        # legacy checkpoint key remap covers this head (eval.py:15-52)
        from handmvnet_tpu.checkpoint import LEGACY_REMAPS

        assert any("pose_net" in p.pattern for p, _ in LEGACY_REMAPS)

    def test_graph_cheb_conv_net(self):
        from handmvnet_tpu.models.nets import GraphChebConvNet

        m = GraphChebConvNet(in_dim=32, out_dim=3, hidden_dim=16, num_layers=3)
        x = jnp.ones((2, 21, 32))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 21, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_residual_graph_conv(self):
        from handmvnet_tpu.models.nets import ResidualGraphConv

        m = ResidualGraphConv(input_dim=16, hid_dim=8, nodes=21)
        x = jnp.ones((2, 21, 16))
        v = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(v, x)
        assert out.shape == (2, 21, 16)

    def test_graph_pool_unpool(self):
        from handmvnet_tpu.models.layers import GraphPool, GraphUnpool

        x = jnp.ones((2, 21, 8))
        pool = GraphPool(out_nodes=10)
        v = pool.init(jax.random.PRNGKey(0), x)
        pooled = pool.apply(v, x)
        assert pooled.shape == (2, 10, 8)
        unpool = GraphUnpool(out_nodes=21)
        v2 = unpool.init(jax.random.PRNGKey(0), pooled)
        assert unpool.apply(v2, pooled).shape == (2, 21, 8)


class TestDormantEncodings:
    def test_learnable_pe(self):
        from handmvnet_tpu.models.layers import LearnablePositionalEncoding

        m = LearnablePositionalEncoding(d_model=16, max_len=50)
        x = jnp.ones((2, 30, 16))
        v = m.init(jax.random.PRNGKey(0), x)
        assert m.apply(v, x).shape == (2, 30, 16)

    def test_frequency_encoding(self):
        from handmvnet_tpu.models.layers import frequency_encoding

        x = jnp.ones((2, 21, 2))
        out = frequency_encoding(x, num_frequencies=4)
        assert out.shape[:2] == (2, 21)
        assert out.shape[-1] == 2 * 2 * 2  # 2 coords x (sin+cos) x 2 freqs

    def test_soft_argmax_3d(self):
        from handmvnet_tpu.ops.heatmap import soft_argmax_3d

        hm = np.zeros((1, 2, 8, 8, 8), dtype=np.float32)
        hm[0, 0, 3, 4, 5] = 10.0
        out = np.asarray(soft_argmax_3d(jnp.asarray(hm)))
        np.testing.assert_allclose(out[0, 0], [5.0, 4.0, 3.0], atol=1e-2)


class TestManoDecoder:
    def test_decode_axis_angle_both_sides(self):
        from handmvnet_tpu.models.mano import ManoDecoder

        dec = ManoDecoder(mano_dir=None)
        pose = np.zeros((2, 48), dtype=np.float32)
        for side in ("right", "left"):
            verts, joints = dec.decode(pose, side=side)
            assert verts.shape == (2, 778, 3)
            assert joints.shape == (2, 21, 3)
            assert np.isfinite(np.asarray(verts)).all()
        # left hand is mirrored in x
        vr, _ = dec.decode(pose, side="right")
        vl, _ = dec.decode(pose, side="left")
        np.testing.assert_allclose(
            np.asarray(vl)[..., 0], -np.asarray(vr)[..., 0], atol=1e-3
        )


class TestDormantParityVsTorch:
    """Converted-weight numerical parity for the dormant module zoo
    (previously shape-smoked only). The reference modules are the oracles."""

    def _ref(self):
        import sys
        from pathlib import Path

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from reference_oracle import import_reference_modules

        return import_reference_modules()

    def test_posenet_parity(self):
        import torch

        from handmvnet_tpu.checkpoint import convert_torch_state_dict
        from handmvnet_tpu.models.nets import PoseNet

        REF = self._ref()
        torch.manual_seed(0)
        tmodel = REF.nets.PoseNet([128, 64, 21]).eval()
        x = np.random.default_rng(1).normal(size=(2, 128, 32, 32)).astype(np.float32)
        with torch.no_grad():
            t_coords, t_hm = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        m = PoseNet(channels=(64, 21))
        coords, hm = m.apply(converted, jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)))
        np.testing.assert_allclose(np.asarray(hm), t_hm.numpy(), atol=1e-4)
        np.testing.assert_allclose(np.asarray(coords), t_coords.numpy(), atol=2e-3)

    def test_graph_cheb_conv_net_parity(self):
        import torch

        from handmvnet_tpu.checkpoint import convert_torch_state_dict
        from handmvnet_tpu.models.nets import GraphChebConvNet

        REF = self._ref()
        torch.manual_seed(0)
        tmodel = REF.nets.GraphChebConvNet(in_dim=32, out_dim=3, hidden_dim=16,
                                           num_layers=3, K=2).eval()
        x = np.random.default_rng(2).normal(size=(2, 21, 32)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        m = GraphChebConvNet(in_dim=32, out_dim=3, hidden_dim=16, num_layers=3)
        out = m.apply(converted, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-4)

    def test_residual_graph_conv_parity(self):
        import torch

        from handmvnet_tpu.checkpoint import convert_torch_state_dict
        from handmvnet_tpu.models.nets import ResidualGraphConv

        REF = self._ref()
        torch.manual_seed(0)
        tmodel = REF.nets.ResidualGraphConv(input_dim=16, hid_dim=8, nodes=21).eval()
        # reference A_hat is an UNINITIALIZED torch.Tensor parameter; give it
        # defined values before comparing
        with torch.no_grad():
            for gnet in (tmodel.gconv1, tmodel.gconv2):
                gnet.A_hat.copy_(torch.randn(21, 21) * 0.1)
        x = np.random.default_rng(3).normal(size=(2, 21, 16)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        m = ResidualGraphConv(input_dim=16, hid_dim=8, nodes=21)
        out = m.apply(converted, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-4)

    def test_graph_pool_unpool_parity(self):
        import torch

        from handmvnet_tpu.checkpoint import convert_torch_state_dict
        from handmvnet_tpu.models.layers import GraphPool, GraphUnpool

        REF = self._ref()
        torch.manual_seed(0)
        x = np.random.default_rng(4).normal(size=(2, 21, 16)).astype(np.float32)
        for ref_cls, cls, nodes in (
            (REF.layers.GraphPool, GraphPool, (21, 10)),
            (REF.layers.GraphUnpool, GraphUnpool, (21, 42)),
        ):
            tmodel = ref_cls(*nodes).eval()
            with torch.no_grad():
                t_out = tmodel(torch.from_numpy(x))
            converted = convert_torch_state_dict(tmodel.state_dict())
            m = cls(out_nodes=nodes[1])
            out = m.apply(converted, jnp.asarray(x))
            np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-5)

    def test_learnable_pe_and_frequency_encoding_parity(self):
        import torch

        from handmvnet_tpu.checkpoint import convert_torch_state_dict
        from handmvnet_tpu.models.layers import (
            LearnablePositionalEncoding,
            frequency_encoding,
        )

        REF = self._ref()
        torch.manual_seed(0)
        tmodel = REF.layers.LearnablePositionalEncoding(d_model=8, max_len=50).eval()
        x = np.random.default_rng(5).normal(size=(2, 30, 8)).astype(np.float32)
        with torch.no_grad():
            t_out = tmodel(torch.from_numpy(x))
        converted = convert_torch_state_dict(tmodel.state_dict())
        m = LearnablePositionalEncoding(d_model=8, max_len=50)
        out = m.apply(converted, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), t_out.numpy(), atol=1e-6)

        t_freq = REF.layers.SinusoidalPositionalEncoding(num_frequencies=4)
        with torch.no_grad():
            t_f = t_freq(torch.from_numpy(x))
        f = frequency_encoding(jnp.asarray(x), num_frequencies=4)
        np.testing.assert_allclose(np.asarray(f), t_f.numpy(), atol=1e-5)


class TestManoDecoderHandsMean:
    def test_axis_angle_decode_adds_hands_mean(self):
        """The reference decoder runs manopth with flat_hand_mean=False
        (mano_decoder.py:6-7): full articulation = input + hands_mean, so
        decode(0) is the MEAN-pose hand. Verified with a nonzero-mean
        model: decode(0) == the flat-hand forward at pose=hands_mean."""
        import dataclasses

        import jax.numpy as jnp

        from handmvnet_tpu.models.mano import (
            ManoLayer,
            synthetic_mano_model,
        )

        rng = np.random.default_rng(5)
        base = synthetic_mano_model()
        mean = (rng.normal(size=45) * 0.2).astype(np.float32)
        model = dataclasses.replace(base, hands_mean=mean)
        layer = ManoLayer(model)

        zero48 = jnp.zeros((2, 48))
        v_mean, j_mean = layer.from_axis_angle(zero48, flat_hand_mean=False)
        explicit = jnp.concatenate(
            [jnp.zeros((2, 3)), jnp.tile(jnp.asarray(mean), (2, 1))], axis=1
        )
        v_ref, j_ref = layer.from_axis_angle(explicit, flat_hand_mean=True)
        np.testing.assert_allclose(np.asarray(v_mean), np.asarray(v_ref), atol=1e-3)
        np.testing.assert_allclose(np.asarray(j_mean), np.asarray(j_ref), atol=1e-3)
        # and it differs from the flat hand (the bug this pins: mean ignored)
        v_flat, _ = layer.from_axis_angle(zero48, flat_hand_mean=True)
        assert np.abs(np.asarray(v_mean) - np.asarray(v_flat)).max() > 1.0  # mm
