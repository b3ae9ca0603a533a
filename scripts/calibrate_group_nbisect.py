"""GROUP-velocity walker accuracy vs bracket-refinement depth.

Group solves difference two phase solves at t/(1 +- 0.005), which
amplifies per-root bracket error ~100x — they therefore kept the full
4*nrefine = 12 in-kernel bisections when the phase default dropped.
This calibrates what the closing secant actually delivers at lower
depths: randomized pathology models, cold-solve the group roots,
apply a vs-move-sized perturbation, warm-solve at each depth, and
compare the GROUP VELOCITIES against the f64 native golden
(igr=1) of the perturbed model.

Run CPU-only:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      NB_DEPTHS=12,4,2,0 python scripts/calibrate_group_nbisect.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import numpy as np
import jax  # noqa: F401
import jax.numpy as jnp

from bayhunter_tpu import native
from bayhunter_tpu.ops.swd import surfdisp_roots_batch

from calibrate_walk_nbisect import NL, PERIODS, KINDS, make_model, _pad


def main():
    assert native.load() is not None
    rs = np.random.RandomState(29)
    per = jnp.asarray(PERIODS, jnp.float32)
    depths = tuple(int(d) for d in os.environ.get(
        'NB_DEPTHS', '12,4,2,0').split(','))
    errs = {nb: [] for nb in depths}
    unfound = {nb: 0 for nb in depths}
    NMOD = int(os.environ.get('NMOD', '10'))
    for kind in KINDS:
        rows0, rows2, golds = [], [], []
        while len(rows0) < NMOD:
            h, vp, vs, rho, vpvs = make_model(rs, kind)
            vs2 = vs.copy()
            i = rs.randint(0, vs.size)
            vs2[i] = np.clip(vs2[i] + rs.normal(0, 0.015), 2.0, 5.0)
            vp2 = vs2 * vpvs
            rho2 = vp2 * 0.32 + 0.77
            cg_n, err_n = native.surfdisp_native(h, vp2, vs2, rho2,
                                                 PERIODS, iwave=2,
                                                 igr=1)
            if err_n:
                continue
            rows0.append((_pad(h, 0.0), _pad(vp, vp[-1]),
                          _pad(vs, vs[-1]), _pad(rho, rho[-1])))
            rows2.append((_pad(h, 0.0), _pad(vp2, vp2[-1]),
                          _pad(vs2, vs2[-1]), _pad(rho2, rho2[-1])))
            golds.append(cg_n)
        B = lambda rows, j: jnp.asarray(  # noqa: E731
            np.stack([r[j] for r in rows]))
        args0 = tuple(B(rows0, j) for j in range(4))
        args2 = tuple(B(rows2, j) for j in range(4))
        gold = np.stack(golds)
        _, _, roots = surfdisp_roots_batch(*args0, per, igr=1,
                                           interpret=True)
        for nb in depths:
            os.environ['BAYHUNTER_WALK_NBISECT'] = str(nb)
            cg, err, _ = surfdisp_roots_batch(
                *args2, per, igr=1, c_prev=roots, warm_halfwidth=2,
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
