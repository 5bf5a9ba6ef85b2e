"""Multi-device tests on the 8-virtual-CPU-device mesh — the analogue of the
reference's `mpirun -n k` scatter/operator tests
(/root/reference/numba-cpu/test_scatterer.py, cuda/test_scatterer.py):
sharded solves must match the single-device solve to roundoff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fustpu.config import Material, Source
from fustpu.mesh.box import build_box_mesh
from fustpu.models.linear import LinearWaveModel
from fustpu.models.westervelt import WesterveltModel
from fustpu.parallel import sharding as sh
from fustpu.parallel.models import ShardedModel


def _build(model_cls, nc=(8, 4, 4), degree=3, L=0.006):
    mat = Material(sound_speed=1480.0, density=1000.0, nonlinearity=3.5,
                   attenuation_dB=0.2)
    src = Source(frequency=1.1e6, amplitude=1.0e5)
    mesh = build_box_mesh(nc, degree, hi=(L, L, L))
    return model_cls(mesh, mat, src, mesh.boundary_facets("x-"),
                     mesh.all_boundary_facets(), dtype=jnp.float64), mat, src


def test_split_merge_roundtrip():
    mesh = build_box_mesh((4, 2, 2), 3)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(mesh.grid_shape)
    st = sh.split_node_field(x, mesh.nc, (2, 2, 1), 3)
    assert st.shape == (2, 2, 1, 7, 4, 7)
    back = sh.merge_node_field(st, mesh.nc, (2, 2, 1), 3)
    assert np.array_equal(back, x)


@pytest.mark.parametrize("S", [(8, 1, 1), (2, 2, 2), (1, 4, 2)])
@pytest.mark.parametrize("model_cls", [LinearWaveModel, WesterveltModel])
def test_sharded_solve_matches_single(S, model_cls):
    model, mat, src = _build(model_cls)
    grid = sh.DeviceGrid.create(S)
    smodel = ShardedModel(model, grid)
    dt, _ = model.cfl_dt(0.4)
    nsteps = 8

    final, _ = model.solve(model.init_state(), dt, nsteps)
    u_ref = np.asarray(final.u)

    dstate = smodel.init_state()
    ds, _ = smodel.solve(dstate, dt, nsteps)
    du = ds.u
    u_dist = smodel.collect(du)

    err = np.linalg.norm(u_dist - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-12, err
    # shared planes must be bitwise consistent across devices
    st = np.asarray(du)
    Pd = model.mesh.degree
    if S[0] > 1:
        assert np.array_equal(st[0, 0, 0, -1], st[1, 0, 0, 0])


def test_halo_sum_plane_consistency():
    """After a sharded assembly, duplicated planes hold identical values."""
    model, *_ = _build(WesterveltModel, nc=(4, 2, 2))
    grid = sh.DeviceGrid.create((2, 2, 1))
    smodel = ShardedModel(model, grid)
    dt, _ = model.cfl_dt(0.4)
    ds, _ = smodel.solve(smodel.init_state(), dt, 3)
    kv = np.asarray(ds.kv)
    assert np.array_equal(kv[0, 0, 0][-1, :, :], kv[1, 0, 0][0, :, :])
    assert np.array_equal(kv[0, 0, 0][:, -1, :], kv[0, 1, 0][:, 0, :])


def test_sharded_pallas_matches_single():
    """Per-device fused Pallas kernel (interpret mode on CPU) inside
    shard_map matches the single-device solve."""
    model, mat, src = _build(WesterveltModel, nc=(4, 4, 4), degree=2)
    grid = sh.DeviceGrid.create((2, 2, 1))
    smodel = ShardedModel(model, grid, stiffness_impl="pallas")
    assert smodel.impl == "pallas"
    dt, _ = model.cfl_dt(0.4)
    nsteps = 3
    final, _ = model.solve(model.init_state(), dt, nsteps)
    ds, _ = smodel.solve(smodel.init_state(), dt, nsteps)
    u = smodel.collect(ds.u)
    err = (np.linalg.norm(u - np.asarray(final.u))
           / np.linalg.norm(np.asarray(final.u)))
    assert err < 1e-12, err


def test_sharded_probe_matches_single():
    """Per-step hydrophone traces recorded inside the sharded scan match
    the single-device traces to roundoff (each probe's interpolation
    window is owned by one device; psum replicates)."""
    from fustpu.utils.eval import PointSampler

    model, *_ = _build(WesterveltModel, nc=(4, 4, 2), degree=3)
    grid = sh.DeviceGrid.create((2, 2, 2))
    smodel = ShardedModel(model, grid)
    dt, _ = model.cfl_dt(0.4)
    L = 0.006
    pts = np.array([[0.31 * L, 0.52 * L, 0.5 * L],
                    [0.87 * L, 0.13 * L, 0.77 * L]])
    pfn = PointSampler(model.mesh, pts).jax_probe()
    _, ys = model.solve(model.init_state(), dt, 5,
                        probe=lambda s: pfn(s.u))
    _, dys = smodel.solve(smodel.init_state(), dt, 5,
                          probe=smodel.probe_fn(pts))
    ys, dys = np.asarray(ys), np.asarray(dys)
    assert ys.shape == dys.shape == (5, 2)
    err = np.linalg.norm(ys - dys) / max(np.linalg.norm(ys), 1e-300)
    assert err < 1e-12, err


def test_multihost_two_processes():
    """2 jax.distributed processes x 4 virtual CPU devices: sharded
    Westervelt == single-device across the process group (the reference's
    `mpirun -n k` test, without MPI; SURVEY §7 step 7)."""
    from fustpu.parallel.multihost import run_multiprocess_check

    run_multiprocess_check(nprocs=2, devices_per_proc=4,
                           grid_shape=(4, 2, 1))


def test_global_reductions_match_single():
    """Distributed multiplicity-weighted dot/norm == the merged-field
    value (shared cut planes counted exactly once)."""
    try:
        shard_map = jax.shard_map
    except AttributeError:
        from jax.experimental.shard_map import shard_map

    from jax.sharding import PartitionSpec as P

    mesh = build_box_mesh((4, 4, 2), 3)
    S = (2, 2, 2)
    grid = sh.DeviceGrid.create(S)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(mesh.grid_shape)
    y = rng.standard_normal(mesh.grid_shape)
    dx = grid.put(sh.split_node_field(x, mesh.nc, S, 3), jnp.float64)
    dy = grid.put(sh.split_node_field(y, mesh.nc, S, 3), jnp.float64)

    def fn(a, b):
        sq = lambda v: v.reshape(v.shape[3:])
        return sh.global_dot(sq(a), sq(b), S)

    mapped = jax.jit(shard_map(fn, mesh=grid.mesh,
                               in_specs=(P(*sh.AXES), P(*sh.AXES)),
                               out_specs=P(), check_vma=False))
    got = float(mapped(dx, dy))
    want = float(np.vdot(x, y))
    assert abs(got - want) / abs(want) < 1e-12


def test_sharded_heterogeneous_matches_single():
    """Heterogeneous media (per-cell c, rho, beta) through the sharded
    path: the expanded coefficient fields are split per device and the
    solve must match single-device to roundoff."""
    rng = np.random.default_rng(7)
    nc = (4, 4, 2)
    mat = Material(
        sound_speed=1400.0 + 200.0 * rng.random(nc),
        density=900.0 + 200.0 * rng.random(nc),
        nonlinearity=3.0 + rng.random(nc),
        attenuation_dB=0.2)
    src = Source(frequency=1.1e6, amplitude=1.0e5)
    L = 0.004
    mesh = build_box_mesh(nc, 3, hi=(L, L, L))
    model = WesterveltModel(mesh, mat, src, mesh.boundary_facets("x-"),
                            mesh.all_boundary_facets(), dtype=jnp.float64,
                            stiffness_impl="mm")
    assert not model.uniform
    grid = sh.DeviceGrid.create((2, 2, 2))
    smodel = ShardedModel(model, grid)
    dt, _ = model.cfl_dt(0.4)
    final, _ = model.solve(model.init_state(), dt, 6)
    ds, _ = smodel.solve(smodel.init_state(), dt, 6)
    u = smodel.collect(ds.u)
    err = (np.linalg.norm(u - np.asarray(final.u))
           / np.linalg.norm(np.asarray(final.u)))
    assert err < 1e-12, err
