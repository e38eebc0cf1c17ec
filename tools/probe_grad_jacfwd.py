"""Round-4 probe: trace gradients by forward Jacobian composition.

The r3 fwd+bwd path (bench run_grad) is reverse-mode with substep remat:
cost ~ 2F + B ~ 3.85x forward, 12.15M ray-steps/s.  Its floor is set by
GATHER COUNT: the backward's substep recompute re-issues every table
gather, and the r3 profile shows gather issue rate (not flops or
bandwidth) binds the kernel, so no transpose restructuring can push far
past fwd/3 ~ 15.6M.

This probe instead pushes the full 8-wide tangent basis FORWARD:

    s2, lin = jax.linearize(step, s)       # primal: gathers, once
    Jstep   = vmap(lin)(basis)             # 8 elementwise tangent maps
    J      <- compose(Jstep, J)            # 8x8 per-ray matmul, 512 FMA

One sweep yields the endpoint AND d(endpoint)/d(launch) as a full per-ray
8x8 Jacobian - gradients of ANY endpoint loss follow by one matvec with
the loss cotangent.  Gather count equals the plain forward; the extra
work is pure VPU flops on a kernel measured at 0.6% VPU utilization.

Usage: python tools/probe_grad_jacfwd.py [rays] [steps]
TPU-serialized: run alone.
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_framework_tpu.models import make_efit
from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.rays import RayState
from graph_framework_tpu.solver import Solver, make_ray_state

EFIT_FILE = "/root/reference/graph_tests/efit.nc"

RAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 300
SUB = 10
CHUNK = int(os.environ.get("PROBE_CHUNK", 100))

NF = len(RayState._fields)


def make_basis(state):
    """(NF,)-batched RayState of one-hot tangents."""
    leaves = []
    for i, f in enumerate(state._fields):
        a = getattr(state, f)
        col = jnp.zeros((NF,) + a.shape, a.dtype).at[i].set(1.0)
        leaves.append(col)
    return RayState(*leaves)


def main():
    eq = make_efit(EFIT_FILE, dtype=jnp.float32)
    state = make_ray_state(RAYS, w=500.0, x=2.5, y=0.0, z=0.0,
                           kx=-477.723, ky=150.0, kz=0.0,
                           dtype=jnp.float32)
    sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1.0e-4,
                 sub_steps=SUB)
    step = sol.raw_step_fn()
    basis = make_basis(state)

    def step_with_jac(carry):
        s, J = carry       # J: RayState with leaves (NF, rays): J[i] = d s/d launch_i
        s2, lin = jax.linearize(step, s)
        # tangent of s2 w.r.t. launch_i = lin(J[:, i]) - push the CURRENT
        # Jacobian columns through the step's linearization (chain rule
        # composition in one go; no explicit 8x8 matmul needed)
        J2 = jax.vmap(lin)(J)
        return s2, J2

    @jax.jit
    def run_chunk(carry):
        def body(c, _):
            return step_with_jac(c), None
        c, _ = jax.lax.scan(body, carry, None, length=CHUNK)
        return c

    carry = (state, basis)
    t0 = time.perf_counter()
    carry = jax.block_until_ready(run_chunk(carry))
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    checks = []
    for _ in range(STEPS // CHUNK - 1):
        carry = run_chunk(carry)
        checks.append(float(carry[0].x[0]))   # forced readback
    elapsed = time.perf_counter() - t0
    s_fin, J = carry
    done = (STEPS - CHUNK) * SUB * RAYS
    rsps = done / elapsed

    print(json.dumps({
        "rays": RAYS, "steps": STEPS, "chunk": CHUNK,
        "t_compile_s": round(t_compile, 2),
        "t_steps_s": round(elapsed, 2),
        "ray_steps_per_s": round(rsps, 1),
        "final_x0": float(s_fin.x[0]),
        "J_xx0": float(J.x[2][0]),       # d x_end / d x0 for ray 0
        "J_xkx0": float(J.x[5][0]),
    }), flush=True)


if __name__ == "__main__":
    main()
