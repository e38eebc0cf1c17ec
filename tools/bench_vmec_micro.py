"""Microbenchmark VMEC hot-path variants on the TPU chip.

Compares, at bench shapes (100k rays, f32):
  A. full RHS (value+grad) of cold_plasma @ VMEC  - the real hot path
  B. _rzl_and_jac alone (geometry primal)
  C. block-fetch strategies for the radial mode tables:
       gather            flat[(idx)] dynamic gather
       onehot-block      onehot @ (ns, 4m), Horner after   (current)
       onehot-horner     [onehot x u^j] @ (4ns, m) - Horner folded into
                         the matmul, value+derivative as two matmuls
  D. mode-sum contraction as one (rays, m) @ (m, 12) matmul vs 12
     elementwise reductions

Run:  python tools/bench_vmec_micro.py
"""

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.vmec import make_vmec, _rzl_and_jac
from graph_framework_tpu.models.rays import make_ray_rhs
from graph_framework_tpu.solver import make_ray_state

VMEC_FILE = "/root/reference/graph_tests/vmec.nc"
N = int(os.environ.get("BENCH_RAYS", 100_000))


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # distinct inputs per rep: remote-PJRT dedupes same-input dispatches
    argsets = []
    for i in range(reps):
        argsets.append([a + jnp.asarray(1e-6 * (i + 1), a.dtype)
                        if isinstance(a, jax.Array)
                        and jnp.issubdtype(a.dtype, jnp.floating)
                        else a for a in args])
    t0 = time.perf_counter()
    outs = [fn(*aa) for aa in argsets]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name:28s} {dt * 1e3:9.3f} ms   "
          f"({N / dt / 1e6:8.2f} M evals/s)", flush=True)
    return dt


def main():
    eq = make_vmec(VMEC_FILE, dtype=jnp.float32)
    state = make_ray_state(N, w=900.0, x=0.5, y=0.5, z=0.0,
                           kx=54.6, ky=0.0, kz=0.0, dtype=jnp.float32)
    s = state.x
    u = state.y
    v = state.z

    # A. full RHS
    rhs = jax.jit(make_ray_rhs(disp.cold_plasma, eq))
    timeit("A rhs(value+grad)", lambda st: rhs(st), state)

    # B. geometry primal
    @jax.jit
    def geo(s, u, v):
        return _rzl_and_jac(eq, s, u, v)
    timeit("B rzl+jac primal", geo, s, u, v)

    # B2. geometry + reverse (cotangent through everything)
    @jax.jit
    def geo_grad(s, u, v):
        def f(s, u, v):
            (r, z, l), (dr, dz, dl) = _rzl_and_jac(eq, s, u, v)
            return jnp.sum(r) + jnp.sum(z) + jnp.sum(dr[0]) + jnp.sum(dl[1])
        return jax.grad(f, argnums=(0, 1, 2))(s, u, v)
    timeit("B2 rzl+jac fwd+bwd", geo_grad, s, u, v)

    # C. fetch strategies on the concatenated rz table
    from graph_framework_tpu.ops.tables import table_index_1d
    rz = jnp.concatenate([eq._grid_table(eq.rmnc_coeffs),
                          eq._grid_table(eq.zmns_coeffs)], axis=-1)
    rz = jax.device_put(rz)
    ns, _, m = rz.shape
    print(f"   table (ns={ns}, 4, m={m})")
    flat = rz.reshape(ns, 4 * m)
    flat2 = rz.reshape(4 * ns, m)      # (cell, coeff) major rows

    @jax.jit
    def fetch_gather(s):
        idx = table_index_1d(s, eq.ds, eq.sminf, ns)
        un = (s - eq.sminf) / eq.ds - idx.astype(s.dtype)
        block = flat[idx].reshape(idx.shape + (4, m))
        un = un[..., None]
        val = block[..., 0, :] + un * (block[..., 1, :]
              + un * (block[..., 2, :] + un * block[..., 3, :]))
        return val

    @jax.jit
    def fetch_onehot_block(s):
        idx = table_index_1d(s, eq.ds, eq.sminf, ns)
        un = (s - eq.sminf) / eq.ds - idx.astype(s.dtype)
        onehot = (idx[:, None] == jnp.arange(ns, dtype=idx.dtype)[None, :]
                  ).astype(s.dtype)
        block = jax.lax.stop_gradient(onehot) @ flat
        block = block.reshape(idx.shape + (4, m))
        un = un[..., None]
        val = block[..., 0, :] + un * (block[..., 1, :]
              + un * (block[..., 2, :] + un * block[..., 3, :]))
        return val

    @jax.jit
    def fetch_onehot_horner(s):
        idx = table_index_1d(s, eq.ds, eq.sminf, ns)
        un = (s - eq.sminf) / eq.ds - idx.astype(s.dtype)
        onehot = (idx[:, None] == jnp.arange(ns, dtype=idx.dtype)[None, :]
                  ).astype(s.dtype)      # (rays, ns)
        up = jnp.stack([jnp.ones_like(un), un, un * un, un ** 3],
                       axis=-1)          # (rays, 4)
        w = (jax.lax.stop_gradient(onehot)[:, :, None]
             * up[:, None, :]).reshape(-1, 4 * ns)
        return w @ flat2                 # (rays, m)

    timeit("C gather+horner", fetch_gather, s)
    timeit("C onehot-block+horner", fetch_onehot_block, s)
    timeit("C onehot-horner-folded", fetch_onehot_horner, s)

    # value equivalence
    a = fetch_gather(s[:64])
    c = fetch_onehot_horner(s[:64])
    print("   max |gather - folded|:", float(jnp.max(jnp.abs(a - c))))

    # E. mode-axis-LEADING geometry clone: tables as (m, 4ns), weights as
    # (4ns, rays), all mode intermediates (m, rays) - modes on sublanes,
    # rays on lanes (no 90->128 lane padding waste), sums over axis 0.
    lm_tbl = eq._grid_table(eq.lmns_coeffs)             # (ns, 4, 90)
    nsl = lm_tbl.shape[0]
    n_grid = eq.xm_grid.shape[0]
    rzT = jnp.asarray(np.ascontiguousarray(
        np.asarray(rz).reshape(ns * 4, 2 * n_grid).T))   # (2m, 4ns)
    lmT = jnp.asarray(np.ascontiguousarray(
        np.asarray(lm_tbl).reshape(nsl * 4, n_grid).T))  # (m, 4ns)
    xm_u, xn_u = eq.xm_unique, eq.xn_unique
    xm_g = eq.xm_grid[:, None]
    xn_g = eq.xn_grid[:, None]

    @jax.jit
    def geoE(s, u, v):
        # radial weights (4ns, rays): onehot x [1, u, u^2, u^3] and the
        # derivative weights [0, 1, 2u, 3u^2]/scale, one matmul each set
        def weights(scale, offset, n):
            idx = table_index_1d(s, scale, offset, n)
            un = (s - offset) / scale - idx.astype(s.dtype)
            onehot = (idx[None, :] == jnp.arange(n, dtype=idx.dtype)[:, None]
                      ).astype(s.dtype)                  # (n, rays)
            one = jnp.ones_like(un)
            zero = jnp.zeros_like(un)
            up = jnp.stack([one, un, un * un, un ** 3])          # (4, rays)
            dup = jnp.stack([zero, one, 2.0 * un, 3.0 * un * un]) / scale
            oh = jax.lax.stop_gradient(onehot)
            w_v = (oh[:, None, :] * up[None, :, :]).reshape(4 * n, -1)
            w_d = (oh[:, None, :] * dup[None, :, :]).reshape(4 * n, -1)
            return jnp.concatenate([w_v, w_d], axis=1)   # (4n, 2*rays)

        nrays = s.shape[0]
        wf = weights(eq.ds, eq.sminf, ns)
        rzb = rzT @ wf                                   # (2m, 2*rays)
        rm, zm = rzb[:n_grid, :nrays], rzb[n_grid:, :nrays]
        rm_s, zm_s = rzb[:n_grid, nrays:], rzb[n_grid:, nrays:]
        wh = weights(eq.ds, eq.sminh, nsl)
        lmb = lmT @ wh
        lm, lm_s = lmb[:, :nrays], lmb[:, nrays:]

        # unique-mode trig outer products, mode-leading
        au = xm_u[:, None] * u[None, :]                  # (n_xm, rays)
        bv = xn_u[:, None] * v[None, :]
        cm, sm = jnp.cos(au), jnp.sin(au)
        cn, sn = jnp.cos(bv), jnp.sin(bv)
        ca = (cm[:, None, :] * cn[None, :, :]
              + sm[:, None, :] * sn[None, :, :]).reshape(n_grid, -1)
        sa = (sm[:, None, :] * cn[None, :, :]
              - cm[:, None, :] * sn[None, :, :]).reshape(n_grid, -1)

        rm_sa = rm * sa
        zm_ca = zm * ca
        lm_ca = lm * ca
        r = jnp.sum(rm * ca, axis=0)
        z = jnp.sum(zm * sa, axis=0)
        dr = (jnp.sum(rm_s * ca, axis=0), -jnp.sum(xm_g * rm_sa, axis=0),
              jnp.sum(xn_g * rm_sa, axis=0))
        dz = (jnp.sum(zm_s * sa, axis=0), jnp.sum(xm_g * zm_ca, axis=0),
              -jnp.sum(xn_g * zm_ca, axis=0))
        dl = (jnp.sum(lm_s * sa, axis=0), jnp.sum(xm_g * lm_ca, axis=0),
              -jnp.sum(xn_g * lm_ca, axis=0))
        return (r, z), (dr, dz, dl)

    timeit("E mode-leading geometry", geoE, s, u, v)

    @jax.jit
    def geoE_grad(s, u, v):
        def f(s, u, v):
            (r, z), (dr, dz, dl) = geoE.__wrapped__(s, u, v)
            return jnp.sum(r) + jnp.sum(z) + jnp.sum(dr[0]) + jnp.sum(dl[1])
        return jax.grad(f, argnums=(0, 1, 2))(s, u, v)
    timeit("E2 mode-leading fwd+bwd", geoE_grad, s, u, v)

    # value check vs current layout
    (rE, zE), (drE, dzE, dlE) = geoE(s[:256], u[:256], v[:256])
    (rB, zB, _lB), (drB, dzB, dlB) = _rzl_and_jac(
        eq, s[:256], u[:256], v[:256])
    import numpy as _np
    print("   max |r - rB|:", float(jnp.max(jnp.abs(rE - rB))),
          " |dr_u|:", float(jnp.max(jnp.abs(drE[1] - drB[1]))))

    # D. mode contraction: 12 reductions vs one matmul
    key = jax.random.PRNGKey(0)
    modes = jax.random.normal(key, (N, m), jnp.float32)
    w12 = jax.random.normal(key, (12, m), jnp.float32)

    @jax.jit
    def reduce12(modes):
        return [jnp.sum(modes * w12[i], axis=-1) for i in range(12)]

    @jax.jit
    def matmul12(modes):
        return modes @ w12.T

    timeit("D 12x elementwise-reduce", reduce12, modes)
    timeit("D one (N,m)@(m,12) matmul", matmul12, modes)


if __name__ == "__main__":
    main()
