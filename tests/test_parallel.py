"""Multi-device (8 virtual CPU devices) sharding tests."""

import jax
import numpy as np
import pytest

from multimodal_fusion_fpn_tpu.parallel.mesh import (make_mesh,
                                                     parse_mesh_spec)


def test_parse_mesh_spec():
    assert parse_mesh_spec(None, 8) == {"data": 8}
    assert parse_mesh_spec("data=4,space=2", 8) == {"data": 4, "space": 2}
    with pytest.raises(ValueError):
        parse_mesh_spec("data=3", 8)


def test_make_mesh_axes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh("data=4,space=2")
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape == (4, 2)


def test_dryrun_multichip_8dev():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_forward():
    import __graft_entry__ as ge
    fn, (variables, batch) = ge.entry()
    out = jax.jit(fn)(variables, batch)
    assert out.shape[0] == batch["image"].shape[0]
    assert np.isfinite(np.asarray(out)).all()
