"""Walker warm-solve accuracy vs bracket-refinement depth.

Randomized pathology models (same generator as tests/test_swd_sweep):
cold-solve roots, apply a vs-move-sized perturbation, warm-solve the
perturbed model with the walking kernel at BAYHUNTER_WALK_NBISECT in
{4, 3, 2} (interpret mode), and compare each root against the f64
native golden of the perturbed model.  Calibrates the bound for a
regression test if a reduced depth ships.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/calibrate_walk_nbisect.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax
import jax.numpy as jnp

from bayhunter_tpu import native
from bayhunter_tpu.ops.swd import surfdisp_roots_batch

NL = 10
PERIODS = np.linspace(2.0, 35.0, 11)
KINDS = ['plain', 'lvz', 'hvz', 'thin', 'vpvs']


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
    return h, vp, vs, rho, vpvs


def _pad(a, hs):
    out = np.full(NL, hs, np.float32)
    out[:a.size] = a
    return out


def main():
    assert native.load() is not None
    rs = np.random.RandomState(17)
    per = jnp.asarray(PERIODS, jnp.float32)
    depths = tuple(int(d) for d in os.environ.get(
        'NB_DEPTHS', '4,3,2').split(','))
    errs = {nb: [] for nb in depths}
    unfound = {nb: 0 for nb in depths}
    NMOD = int(os.environ.get('NMOD', '10'))
    for kind in KINDS:
        rows0, rows2, golds, keep = [], [], [], []
        while len(rows0) < NMOD:
            h, vp, vs, rho, vpvs = make_model(rs, kind)
            # vs-move-sized perturbation (propdist ~0.015, 1 nucleus)
            vs2 = vs.copy()
            i = rs.randint(0, vs.size)
            vs2[i] = np.clip(vs2[i] + rs.normal(0, 0.015), 2.0, 5.0)
            vp2 = vs2 * vpvs
            rho2 = vp2 * 0.32 + 0.77
            cg_n, err_n = native.surfdisp_native(h, vp2, vs2, rho2,
                                                 PERIODS, iwave=2)
            if err_n:
                continue
            rows0.append((_pad(h, 0.0), _pad(vp, vp[-1]),
                          _pad(vs, vs[-1]), _pad(rho, rho[-1])))
            rows2.append((_pad(h, 0.0), _pad(vp2, vp2[-1]),
                          _pad(vs2, vs2[-1]), _pad(rho2, rho2[-1])))
            golds.append(cg_n)
        B = lambda rows, j: jnp.asarray(
            np.stack([r[j] for r in rows]))
        args0 = tuple(B(rows0, j) for j in range(4))
        args2 = tuple(B(rows2, j) for j in range(4))
        gold = np.stack(golds)
        _, _, roots = surfdisp_roots_batch(*args0, per,
                                           interpret=True)
        for nb in depths:
            os.environ['BAYHUNTER_WALK_NBISECT'] = str(nb)
            cg, err, _ = surfdisp_roots_batch(
                *args2, per, c_prev=roots, warm_halfwidth=2,
                warm_trips_cap=2, pert_newton=True, interpret=True)
            del os.environ['BAYHUNTER_WALK_NBISECT']
            cgv = np.asarray(cg)
            bad = ~np.isfinite(cgv) | (cgv <= 0)
            unfound[nb] += int(bad.sum())
            errs[nb].append(np.abs(cgv[~bad] - gold[~bad]))
    for nb in depths:
        e = np.concatenate(errs[nb])
        print('nb=%d  n=%d unfound=%d  median=%.2e p99=%.2e max=%.2e'
              % (nb, e.size, unfound[nb], np.median(e),
                 np.percentile(e, 99), e.max()))


if __name__ == '__main__':
    main()
