"""Same-session A/B + parity of the Love-wave batch solver on TPU:
pallas dltar1 kernel (surfdisp_roots_batch iwave=1) vs the vmapped
XLA dltar1 per-chain solver.

Usage:  python scripts/bench_love_ab.py [nchains]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..',
                               '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import jax.numpy as jnp  # noqa: E402

C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
NL = 21
REPS = 30


def main():
    from bayhunter_tpu.ops.swd import surfdisp_roots, surfdisp_roots_batch

    rs = np.random.RandomState(0)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 8)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    per = jnp.asarray(np.linspace(2, 35, 11), jnp.float32)
    args = [jnp.asarray(x) for x in (H, VP, VS, RHO)]

    fb = jax.jit(lambda *a: surfdisp_roots_batch(*a, per, iwave=1))
    fv = jax.jit(lambda *a: jax.vmap(
        lambda h, vp, vs, rho: surfdisp_roots(h, vp, vs, rho, per,
                                              iwave=1))(*a))

    cg_b, err_b, roots_b = jax.block_until_ready(fb(*args))
    cg_v, err_v, roots_v = jax.block_until_ready(fv(*args))
    d = np.max(np.abs(np.asarray(cg_b) - np.asarray(cg_v)))
    same_err = np.array_equal(np.asarray(err_b), np.asarray(err_v))
    print(f'cold parity: maxdiff {d:.2e} err-match {same_err} '
          f'({"OK" if d <= 2e-5 and same_err else "FAIL"})')

    # warm path parity
    fbw = jax.jit(lambda *a: surfdisp_roots_batch(
        *a[:4], per, c_prev=a[4], iwave=1)[0])
    fvw = jax.jit(lambda *a: jax.vmap(
        lambda h, vp, vs, rho, cp: surfdisp_roots(
            h, vp, vs, rho, per, c_prev=cp, iwave=1)[0])(*a))
    rp = roots_b + 0.01
    w_b = jax.block_until_ready(fbw(*args, rp))
    w_v = jax.block_until_ready(fvw(*args, rp))
    dw = np.max(np.abs(np.asarray(w_b) - np.asarray(w_v)))
    print(f'warm parity: maxdiff {dw:.2e} '
          f'({"OK" if dw <= 2e-5 else "FAIL"})')

    out = {}
    for name, fn in (('pallas_batch', fbw), ('xla_vmap', fvw)):
        r = fn(*args, rp)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(REPS):
            r = fn(*args, rp)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / REPS
        out[name] = dt
        print(f'{name:12s} {dt * 1e3:8.3f} ms/warm-solve '
              f'({C / dt:,.0f} models/s)')
    print(f'speedup pallas vs xla_vmap: '
          f'{out["xla_vmap"] / out["pallas_batch"]:.2f}x')


if __name__ == '__main__':
    main()
