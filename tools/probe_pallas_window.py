"""Probe: frozen-window Pallas EFIT step vs the XLA frozen path on chip.

Measures ray-steps/s (integrator substeps x rays / s) for the multi-substep
VMEM-resident kernel (pallas/efit_step.py) across block_rows configs, next
to the XLA frozen path at the same (method, K).  Timing per the backend
rules (memory: tpu-backend-limits): one jitted scan per measurement,
forced by a scalar data readback, donated carry.

Usage: python tools/probe_pallas_window.py [num_rays] [steps]
Env: METHOD=rk2|rk4 K=10 COMP=0|1 BLOCK_ROWS=8,16,32
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_framework_tpu.solver import Solver, make_ray_state, init_k
from graph_framework_tpu.models.dispersion import cold_plasma
from graph_framework_tpu.models.efit import make_efit
from graph_framework_tpu.pallas.efit_step import make_frozen_window_step
from graph_framework_tpu.ops.compensated import init_comp_carry

EFIT = os.environ.get("EFIT_FILE", "/root/reference/graph_tests/efit.nc")


def time_run(fn, carry, steps):
    def go(c):
        def body(c, _):
            return fn(c), None
        c, _ = jax.lax.scan(body, c, None, length=steps)
        return c
    jgo = jax.jit(go, donate_argnums=0)
    warm = jgo(jax.tree.map(jnp.copy, carry))
    jax.block_until_ready(warm)
    x = warm.hi.x if hasattr(warm, "hi") else warm.x
    _ = float(x[0])
    t0 = time.perf_counter()
    out = jgo(jax.tree.map(jnp.copy, carry))
    x = out.hi.x if hasattr(out, "hi") else out.x
    _ = float(x[0])             # force real completion (async timing lies)
    el = time.perf_counter() - t0
    fin = float(jnp.mean(jnp.isfinite(x).astype(jnp.float32)))
    return el, fin


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 102400
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    method = os.environ.get("METHOD", "rk2")
    K = int(os.environ.get("K", "10"))
    comp = os.environ.get("COMP", "0") == "1"
    sub = 10
    dt = 1.0e-4

    eq = make_efit(EFIT, dtype=jnp.float32)
    st = make_ray_state(n, w=650.0, x=2.0, y=0.0, z=0.0,
                        kx=-400.0, ky=150.0, kz=0.0, dtype=jnp.float32)
    st = init_k(st, cold_plasma, eq, "kx")
    jax.block_until_ready(st)
    total = n * steps * sub

    # XLA frozen baseline
    sol = Solver(cold_plasma, eq, method=method, dt=dt, sub_steps=sub,
                 frozen_cells=True, freeze_every=K, compensated=comp)
    carry0 = sol.init_carry(st)
    el, fin = time_run(sol.raw_step_fn(), carry0, steps)
    print(f"xla   frozen {method} K={K} comp={comp}: "
          f"{total / el / 1e6:8.1f}M ray-steps/s  finite={fin:.3f}")

    for br in [int(b) for b in
               os.environ.get("BLOCK_ROWS", "8,16,32").split(",")]:
        if (n // 128) % br:
            continue
        step = make_frozen_window_step(
            eq, cold_plasma, method=method, dt=dt, sub_steps=sub,
            freeze_every=K, block_rows=br, compensated=comp)
        try:
            el, fin = time_run(step, carry0, steps)
        except Exception as e:
            print(f"pallas br={br}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        print(f"pallas br={br} {method} K={K} comp={comp}: "
              f"{total / el / 1e6:8.1f}M ray-steps/s  finite={fin:.3f}")


if __name__ == "__main__":
    main()
