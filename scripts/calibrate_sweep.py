"""One-off calibration for tests/test_swd_sweep.py bounds: randomized
pathological models -> native golden agreement + f32 refinement error
distribution.  Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/calibrate_sweep.py
"""
import os
import numpy as np
import jax
jax.config.update('jax_enable_x64', True)
import jax.numpy as jnp

from bayhunter_tpu.ops.swd import surfdisp
from bayhunter_tpu import native

NL = 10
PERIODS = np.linspace(2.0, 35.0, 11)


def pad(arr, nl, hs):
    out = np.full(nl, hs)
    out[:arr.size] = arr
    return out


def make_model(rs, kind):
    nlay = rs.randint(3, 7)
    vs = np.sort(rs.uniform(2.2, 4.6, nlay))
    h = rs.uniform(3.0, 15.0, nlay)
    vpvs = 1.73
    if kind == 'lvz':
        i = rs.randint(1, nlay - 1)
        vs[i] = vs[i - 1] * rs.uniform(0.75, 0.95)
    elif kind == 'hvz':
        i = rs.randint(1, nlay - 1)
        vs[i] = min(vs[i + 1] * rs.uniform(1.05, 1.25), 4.8)
    elif kind == 'thin':
        h[rs.randint(0, nlay - 1)] = rs.uniform(0.3, 1.5)
    elif kind == 'vpvs':
        vpvs = rs.uniform(1.9, 2.1)
    h[-1] = 0.0
    vp = vs * vpvs
    rho = vp * 0.32 + 0.77
    return h, vp, vs, rho


def run_case(h, vp, vs, rho, iwave, mode, igr, dtype):
    hp = jnp.asarray(pad(h, NL, 0.0), dtype)
    vpp = jnp.asarray(pad(vp, NL, vp[-1]), dtype)
    vsp = jnp.asarray(pad(vs, NL, vs[-1]), dtype)
    rhop = jnp.asarray(pad(rho, NL, rho[-1]), dtype)
    cg, err = surfdisp(hp, vpp, vsp, rhop,
                       jnp.asarray(PERIODS, dtype),
                       iwave=iwave, mode=mode, igr=igr)
    return np.asarray(cg), bool(err)


def main():
    assert native.load() is not None
    rs = np.random.RandomState(42)
    kinds = ['plain', 'lvz', 'hvz', 'thin', 'vpvs']
    combos = [(2, 1, 0), (1, 1, 0), (2, 1, 1), (2, 2, 0), (2, 3, 0)]
    n_per = 40
    stats = {}
    f32_errs = []
    for kind in kinds:
        for _ in range(n_per):
            h, vp, vs, rho = make_model(rs, kind)
            for iwave, mode, igr in combos:
                cg_n, err_n = native.surfdisp_native(
                    h, vp, vs, rho, PERIODS, iwave=iwave, mode=mode,
                    igr=igr)
                cg_j, err_j = run_case(h, vp, vs, rho, iwave, mode,
                                       igr, jnp.float64)
                key = (kind, iwave, mode, igr)
                s = stats.setdefault(key, dict(n=0, errboth=0,
                                               errmismatch=0,
                                               maxdiff=0.0, bad=0))
                s['n'] += 1
                if err_n != err_j:
                    s['errmismatch'] += 1
                    continue
                if err_n:
                    s['errboth'] += 1
                    continue
                d = np.max(np.abs(cg_j - cg_n))
                s['maxdiff'] = max(s['maxdiff'], d)
                if d > 5e-4:
                    s['bad'] += 1
                # f32 vs f64 refinement error (fundamental phase only)
                if (iwave, mode, igr) == (2, 1, 0):
                    cg32, err32 = run_case(h, vp, vs, rho, iwave,
                                           mode, igr, jnp.float32)
                    if not err32:
                        f32_errs.append(np.abs(cg32 - cg_n))
    for k in sorted(stats):
        s = stats[k]
        print('%-24s n=%3d errboth=%3d errmismatch=%2d bad=%2d '
              'maxdiff=%.2e' % (str(k), s['n'], s['errboth'],
                                s['errmismatch'], s['bad'],
                                s['maxdiff']))
    e = np.concatenate(f32_errs)
    print('f32 refinement error: n=%d median=%.2e p90=%.2e p99=%.2e '
          'max=%.2e' % (e.size, np.median(e), np.percentile(e, 90),
                        np.percentile(e, 99), e.max()))


if __name__ == '__main__':
    main()
