"""Diagnose the dimension-move cached-slope Newton: on realistic
birth proposals, compare the iteration-1 recentering error of
(a) the FD value+slope pair at the new model, vs
(b) the cached old-model slope rescaled by the renormalization
    exponents (Newton on the true-scale function).

Usage: python scripts/diag_dim_slope_cache.py  (CPU, f32)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp

from bayhunter_tpu.ops.swd import (dltar4, dltar4_exp, DDC,
                                   surfdisp_roots_batch)

rs = np.random.RandomState(7)
NL, C = 21, 64
per = np.linspace(1.0, 41.0, 21).astype(np.float32)

H = np.zeros((C, NL), np.float32)
VS = np.zeros((C, NL), np.float32)
for i in range(C):
    nlay = rs.randint(4, 9)
    z = np.sort(rs.uniform(1, 58, nlay))
    v = np.sort(rs.uniform(2.1, 4.9, nlay))
    H[i, :nlay - 1] = np.diff(np.concatenate([[0], 0.5 * (z[:-1] + z[1:])]))
    VS[i] = v[-1]
    VS[i, :nlay] = v

def mk(vs_, h_):
    return [jnp.asarray(x) for x in
            (h_, vs_ * 1.73, vs_, vs_ * 1.73 * 0.32 + 0.77)]

args = mk(VS, H)
cg0, err0, roots, slopes, exps = surfdisp_roots_batch(
    *args, jnp.asarray(per), return_slopes=True, interpret=True)
print('cold errs:', int(np.asarray(err0).sum()))

# birth proposals: new nucleus at uniform depth, vs from nearest
H2 = H.copy(); VS2 = VS.copy()
for i in range(C):
    nlay = int((H[i] > 0).sum()) + 1
    zb = rs.uniform(0, 60)
    # rebuild voronoi-ish: insert a layer at random position k
    k = rs.randint(0, nlay)
    H2[i, k + 1:] = H[i, k:-1]
    VS2[i, k + 1:] = VS[i, k:-1]
    split = rs.uniform(0.25, 0.75)
    hk = H[i, k] if H[i, k] > 0 else 4.0
    H2[i, k] = hk * split
    H2[i, k + 1] = hk * (1 - split)
    VS2[i, k + 1] = VS[i, k] + rs.normal(0, 0.015)
args2 = mk(VS2, H2)

# true new roots (cold solve of the proposal)
cgt, errt, roots_new, _, _ = surfdisp_roots_batch(
    *args2, jnp.asarray(per), return_slopes=True, interpret=True)
ok = ~np.asarray(errt) & ~np.asarray(err0)

om = jnp.broadcast_to(jnp.asarray(2 * np.pi / per), (C, per.size))
c0 = jnp.asarray(np.asarray(roots))

def sec_new(c):
    return jax.vmap(lambda cc, omr, d, a, b, r: dltar4_exp(
        omr / cc, omr, d, a, b, r, jnp.asarray(False)))(
        c, om, *args2)

eps = DDC / 16.0
v0, lg0 = sec_new(c0)
v1, _ = sec_new(c0 + eps)
slope_fd = (v1 - v0) / eps
shift_fd = jnp.clip(-v0 / jnp.where(slope_fd == 0, 1.0, slope_fd),
                    -0.96, 0.96)
c_fd = c0 + shift_fd

sl_resc = jnp.asarray(np.asarray(slopes)) * jnp.exp(
    jnp.clip(lg0 - jnp.asarray(np.asarray(exps)), -60, 60))
shift_sl = jnp.clip(-v0 / jnp.where(sl_resc == 0, 1.0, sl_resc),
                    -0.96, 0.96)
c_sl = c0 + shift_sl

err_raw = np.abs(np.asarray(c0) - np.asarray(roots_new))[ok] / DDC
err_fd = np.abs(np.asarray(c_fd) - np.asarray(roots_new))[ok] / DDC
err_sl = np.abs(np.asarray(c_sl) - np.asarray(roots_new))[ok] / DDC
for name, e in (('raw', err_raw), ('fd', err_fd), ('cached', err_sl)):
    print('%6s iter-1 error (DDC): p50 %.3f p90 %.3f p99 %.2f max %.1f'
          % (name, np.percentile(e, 50), np.percentile(e, 90),
             np.percentile(e, 99), e.max()))
# slope-quality: ratio of rescaled-cached to FD slope
r = np.asarray(sl_resc / jnp.where(slope_fd == 0, 1.0, slope_fd))[ok]
print('slope ratio cached/fd: p10 %.3f p50 %.3f p90 %.3f; '
      'neg frac %.3f' % (np.percentile(r, 10), np.percentile(r, 50),
                         np.percentile(r, 90), (r < 0).mean()))

# --- two-iteration schedules with a tight cached-shift clamp -------
def secant_iter(c_prev, v_prev, c_cur, slope_fallback, clamp):
    v_cur, _ = sec_new(c_cur)
    step = c_cur - c_prev
    sec = (v_cur - v_prev) / jnp.where(step == 0, 1.0, step)
    sl = jnp.where(jnp.abs(step) > eps, sec, slope_fallback)
    sl = jnp.where(sl == 0, 1.0, sl)
    return jnp.clip(c_cur - v_cur / sl, None, None), c_cur, v_cur

for clamp_ddc in (192.0, 16.0, 8.0, 4.0):
    clamp = clamp_ddc * DDC
    shift1 = jnp.clip(-v0 / jnp.where(sl_resc == 0, 1.0, sl_resc),
                      -clamp, clamp)
    c1 = c0 + shift1
    c2, _, _ = secant_iter(c0, v0, c1, sl_resc, clamp)
    e2 = np.abs(np.asarray(c2) - np.asarray(roots_new))[ok] / DDC
    print('cached clamp %5.0f + secant: p50 %.3f p90 %.3f p99 %.2f '
          'max %.1f; frac>2DDC %.4f'
          % (clamp_ddc, np.percentile(e2, 50), np.percentile(e2, 90),
             np.percentile(e2, 99), e2.max(), (e2 > 2).mean()))

# FD baseline with its secant follow-up
c1 = c_fd
c2, _, _ = secant_iter(c0, v0, c1, slope_fd, 1.0)
e2 = np.abs(np.asarray(c2) - np.asarray(roots_new))[ok] / DDC
print('fd + secant:               p50 %.3f p90 %.3f p99 %.2f max '
      '%.1f; frac>2DDC %.4f'
      % (np.percentile(e2, 50), np.percentile(e2, 90),
         np.percentile(e2, 99), e2.max(), (e2 > 2).mean()))

# --- DEATH proposals ------------------------------------------------
H3 = H.copy(); VS3 = VS.copy()
for i in range(C):
    nlay = int((H[i] > 0).sum()) + 1
    if nlay <= 3:
        continue
    k = rs.randint(0, nlay - 1)
    # remove layer k: merge its thickness into the neighbor
    H3[i, k:-1] = H[i, k + 1:]
    VS3[i, k:-1] = VS[i, k + 1:]
    H3[i, min(k, nlay - 3)] += H[i, k]
    H3[i, nlay - 2:] = 0.0
    VS3[i, nlay - 2:] = VS3[i, nlay - 2]
args3 = mk(VS3, H3)
cgt3, errt3, roots_new3, _, _ = surfdisp_roots_batch(
    *args3, jnp.asarray(per), return_slopes=True, interpret=True)
ok3 = ~np.asarray(errt3) & ~np.asarray(err0)

def sec3(c):
    return jax.vmap(lambda cc, omr, d, a, b, r: dltar4_exp(
        omr / cc, omr, d, a, b, r, jnp.asarray(False)))(
        c, om, *args3)

v0d, lg0d = sec3(c0)
v1d, _ = sec3(c0 + eps)
slope_fdd = (v1d - v0d) / eps
c_fdd = c0 + jnp.clip(-v0d / jnp.where(slope_fdd == 0, 1., slope_fdd),
                      -0.96, 0.96)
sl_rd = jnp.asarray(np.asarray(slopes)) * jnp.exp(
    jnp.clip(lg0d - jnp.asarray(np.asarray(exps)), -60, 60))
c_sld = c0 + jnp.clip(-v0d / jnp.where(sl_rd == 0, 1., sl_rd),
                      -0.96, 0.96)
for name, cx in (('fd', c_fdd), ('cached', c_sld)):
    e = np.abs(np.asarray(cx) - np.asarray(roots_new3))[ok3] / DDC
    print('DEATH %6s iter-1 (DDC): p50 %.3f p90 %.3f p99 %.2f max '
          '%.1f; frac>2 %.4f' % (name, np.percentile(e, 50),
                                 np.percentile(e, 90),
                                 np.percentile(e, 99), e.max(),
                                 (e > 2).mean()))
rd = np.asarray(sl_rd / jnp.where(slope_fdd == 0, 1., slope_fdd))[ok3]
print('DEATH slope ratio cached/fd: p10 %.3f p50 %.3f p90 %.3f; '
      'neg frac %.4f' % (np.percentile(rd, 10), np.percentile(rd, 50),
                         np.percentile(rd, 90), (rd < 0).mean()))
