"""Driver-entry tests: the multichip dryrun must keep compiling+running
on CPU meshes of several sizes (this is what the driver validates)."""

import sys

import jax
import pytest

sys.path.insert(0, ".")
import __graft_entry__ as graft  # noqa: E402


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip(n, capsys):
    if len(jax.devices()) < n:
        pytest.skip("not enough virtual devices")
    graft.dryrun_multichip(n)
    out = capsys.readouterr().out
    assert f"dryrun_multichip({n})" in out
    assert "loss=" in out


def test_mesh_shape_factoring():
    assert graft._mesh_shape(8) == (2, 2, 2)
    assert graft._mesh_shape(4) == (1, 2, 2)
    assert graft._mesh_shape(2) == (1, 1, 2)
    assert graft._mesh_shape(1) == (1, 1, 1)
    for n in (1, 2, 4, 6, 8, 16):
        d, a, f = graft._mesh_shape(n)
        assert d * a * f == n
