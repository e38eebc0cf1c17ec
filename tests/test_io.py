"""Result-file semantics tests (output.hpp behaviors)."""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_framework_tpu.io.output import ResultFile, AsyncWriter


def test_reopen_append_variable(tmp_path):
    """The absorption phase reopens the trace file and appends a variable
    (output.hpp:73-82 reopen ctor)."""
    p = tmp_path / "r.nc"
    with ResultFile(p, num_rays=4) as f:
        f.create_variable("x")
        for i in range(3):
            f.write_step(i, {"x": np.full(4, float(i))})
    with ResultFile(p, mode="r+") as f:
        assert f.num_rays == 4
        assert f.num_steps == 3
        f.create_variable("kamp", complex_valued=True)
        f.write_step(1, {"kamp": np.full(4, 1 + 2j)})
        k = f.read_step(1, ["kamp"], complex_valued=True)["kamp"]
        np.testing.assert_allclose(k, 1 + 2j)
        # original data untouched
        np.testing.assert_allclose(f.read_step(2, ["x"])["x"], 2.0)


def test_complex_stored_as_ray_dim_pairs(tmp_path):
    """Complex values land as a trailing (re, im) axis - the reference's
    ray_dim=2 layout (output.hpp:144-158)."""
    import h5py
    p = tmp_path / "c.nc"
    with ResultFile(p, num_rays=2) as f:
        f.create_variable("kamp", complex_valued=True)
        f.write_step(0, {"kamp": np.array([1 + 2j, 3 - 4j])})
    with h5py.File(p, "r") as h:
        assert h["kamp"].shape == (1, 2, 2)
        np.testing.assert_allclose(h["kamp"][0, 0], [1.0, 2.0])
        np.testing.assert_allclose(h["kamp"][0, 1], [3.0, -4.0])


def test_async_writer_orders_and_flushes(tmp_path):
    p = tmp_path / "w.nc"
    with ResultFile(p, num_rays=3) as f:
        f.create_variable("x")
        w = AsyncWriter(f)
        for i in range(10):
            w.write_step(i, {"x": np.full(3, float(i))})
        w.close()
        for i in range(10):
            np.testing.assert_allclose(f.read_step(i, ["x"])["x"], float(i))


def test_async_writer_surfaces_errors(tmp_path):
    p = tmp_path / "e.nc"
    f = ResultFile(p, num_rays=2)
    f.create_variable("x")
    w = AsyncWriter(f)
    w.write_step(0, {"nonexistent": np.zeros(2)})
    with pytest.raises(KeyError):
        w.close()
    f.close()


def test_out_of_order_write(tmp_path):
    """Power binning writes rows back out of sequence
    (read-modify-write, xrays.cpp:758-782)."""
    p = tmp_path / "o.nc"
    with ResultFile(p, num_rays=2) as f:
        f.create_variable("p")
        f.write_step(5, {"p": np.full(2, 5.0)})
        f.write_step(2, {"p": np.full(2, 2.0)})
        assert f.num_steps == 6
        np.testing.assert_allclose(f.read_step(2, ["p"])["p"], 2.0)
        np.testing.assert_allclose(f.read_step(5, ["p"])["p"], 5.0)


def test_checkpoint_roundtrip_sharded(tmp_path):
    """Orbax checkpoint of a sharded RayState restores arrays, shardings,
    and supports step-indexed resume (io/checkpoint.py)."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from graph_framework_tpu.solver import make_ray_state
    from graph_framework_tpu.parallel.mesh import ray_mesh, shard_rays, RAY_AXIS
    from graph_framework_tpu.io import (
        save_ray_state, restore_ray_state, latest_step)

    mesh = ray_mesh(jax.devices())
    state = make_ray_state(16, w=500.0, x=2.5, kx=-500.0,
                           dtype=jnp.float32)
    state = shard_rays(state, mesh)

    save_ray_state(tmp_path / "ck", state, step=7)
    assert latest_step(tmp_path / "ck") == 7

    sharding = NamedSharding(mesh, P(RAY_AXIS))
    restored = restore_ray_state(tmp_path / "ck", state, step=7,
                                 sharding=sharding)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored.x.sharding.is_equivalent_to(sharding, restored.x.ndim)

    # template-free restore
    raw = restore_ray_state(tmp_path / "ck", step=7)
    np.testing.assert_array_equal(np.asarray(raw.x), np.asarray(state.x))
