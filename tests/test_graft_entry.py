"""Driver-entrypoint tests: the multi-chip dryrun must be REAL — forcing a
CPU mesh of exactly n virtual devices in a clean subprocess (round-1 failure
mode: the dryrun ran against the single tunneled TPU and either crashed on a
libtpu mismatch or silently "passed" on a 1-device mesh)."""

import numpy as np
import pytest

from handmvnet_tpu.parallel import make_mesh


class TestMakeMeshStrict:
    def test_raises_on_insufficient_devices(self):
        with pytest.raises(ValueError, match="8-device mesh"):
            make_mesh(num_devices=8, devices=[object()])

    def test_exact_count(self):
        import jax

        mesh = make_mesh(num_devices=4)
        assert mesh.devices.size == 4
        assert len(jax.devices()) >= 4


@pytest.mark.slow
def test_dryrun_multichip_subprocess(capfd):
    """dryrun_multichip(8) must succeed from a process whose backend is
    already initialized (as the driver's is), by virtue of the subprocess."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
    out = capfd.readouterr().out
    assert "dryrun_multichip(8) OK" in out
    assert out.count("CPU") >= 8  # 8 virtual CPU devices listed


@pytest.mark.slow
def test_dryrun_impl_asserts_mesh_size(monkeypatch):
    """The impl (not just the wrapper) must refuse to run on fewer devices
    than requested."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    with pytest.raises((AssertionError, ValueError)):
        # only 8 virtual devices exist in the test process
        __graft_entry__._dryrun_impl(64)
