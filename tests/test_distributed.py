"""True multi-process distributed test (SURVEY.md section 4 carry-over:
"multi-host tests need what the reference never had - use jax.distributed
with multi-process CPU to emulate a pod on one host").

Two OS processes x 4 virtual CPU devices form one 8-device global mesh;
the ray ensemble is sharded across all of them, one solver step runs SPMD,
the Newton-style ensemble max rides a cross-process collective, and each
process writes only its own shard rows (the reference's file-per-worker
output layout, xrays.cpp:461).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
port, pid, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from graph_framework_tpu.parallel import distributed
distributed.initialize(f"localhost:{port}", num_processes=2, process_id=pid)

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from graph_framework_tpu.models import make_slab_density
from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.rays import RayState, residual_fn
from graph_framework_tpu.solver import Solver

mesh = Mesh(np.asarray(jax.devices()), ("rays",))
sharding = NamedSharding(mesh, P("rays"))

N = 32
host_vals = dict(
    t=np.zeros(N), w=np.full(N, 20.0), x=np.linspace(0.0, 0.31, N),
    y=np.zeros(N), z=np.zeros(N), kx=np.full(N, 15.0),
    ky=np.zeros(N), kz=np.zeros(N))

def dist(a):
    a = a.astype(np.float32)
    return jax.make_array_from_callback(a.shape, sharding, lambda i: a[i])

state = RayState(**{k: dist(v) for k, v in host_vals.items()})
eq = make_slab_density()
sol = Solver(disp.light_wave, eq, method="rk4", dt=1e-4, sub_steps=2)
step = sol.step_fn()
res = residual_fn(disp.light_wave, eq)

out = step(state)
# global ensemble max: a cross-process all-reduce (the workload's one
# collective; SURVEY.md section 2.6)
gmax = jax.jit(lambda s: jnp.max(res(s)))(out)
print("GMAX", float(gmax))

idx, vals = distributed.host_local_rows(out.x)
assert idx.shape[0] == N // 2, idx.shape     # each host owns half the rays
np.save(f"{outdir}/rows{pid}.npy", np.stack([idx, vals]))
print("OK", pid, idx.min(), idx.max())
"""


def test_two_process_mesh_step(tmp_path):
    with socket.socket() as s:
        s.bind(("", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(port), str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o

    # both processes computed the same global max (the collective worked)
    gmax = [float(line.split()[1]) for o in outs for line in o.splitlines()
            if line.startswith("GMAX")]
    assert len(gmax) == 2 and abs(gmax[0] - gmax[1]) <= 1e-12 * max(
        1.0, abs(gmax[0]))

    # shards partition the global ray axis with no overlap
    r0 = np.load(tmp_path / "rows0.npy")
    r1 = np.load(tmp_path / "rows1.npy")
    all_idx = np.concatenate([r0[0], r1[0]]).astype(int)
    assert sorted(all_idx.tolist()) == list(range(32))
