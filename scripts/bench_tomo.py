"""Tomography-scale demonstration on TPU: many cells x many chains
as ONE device program (parallel/tomo.py).

Forward-models a distinct 4-layer truth per cell (Moho depth and
crustal Vs vary across the map), adds noise, inverts every cell
simultaneously, and checks per-cell recovery of the varying
parameters.  Prints the aggregate throughput and a recovery summary.

Usage:  python scripts/bench_tomo.py [ncells] [chains_per_cell] [iters]
"""

import logging
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

NCELLS = int(sys.argv[1]) if len(sys.argv) > 1 else 64
CPC = int(sys.argv[2]) if len(sys.argv) > 2 else 32
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 16384

logging.basicConfig(level=logging.INFO,
                    format=' %(levelname)-7s | %(message)s')


def main():
    from bayhunter_tpu.parallel.tomo import TomoInversion
    from bayhunter_tpu.synthobs import SynthObs

    rs = np.random.RandomState(3)
    x = np.linspace(2.0, 35.0, 15)

    # per-cell truths: Moho depth 28-44 km, crustal Vs 3.4-3.8 km/s
    moho = rs.uniform(28.0, 44.0, NCELLS)
    vcrust = rs.uniform(3.4, 3.8, NCELLS)
    Y = np.empty((NCELLS, x.size))
    for c in range(NCELLS):
        h = [5.0, moho[c] - 5.0, 0.0]
        vs = [2.8, vcrust[c], 4.4]
        _, y = SynthObs.return_swddata(np.asarray(h), np.asarray(vs),
                                       vpvs=1.73, x=x)['rdispph']
        Y[c] = np.asarray(y) + 0.01 * rs.normal(size=x.size)

    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, 15),
              'vpvs': 1.73, 'mohoest': None, 'mantle': None,
              'swdnoise_corr': 0.0, 'swdnoise_sigma': (1e-5, 0.05)}
    initparams = {'propdist': (0.015, 0.015, 0.015, 0.005, 0.005),
                  'acceptance': (40, 45), 'thickmin': 0.1,
                  'lvz': None, 'hvz': None, 'rcond': 1e-5,
                  'iter_burnin': ITERS, 'iter_main': ITERS // 2}

    tomo = TomoInversion(x, Y, ref='rdispph', chains_per_cell=CPC,
                         priors=priors, initparams=initparams,
                         random_seed=11)
    t0 = time.time()
    out = tomo.run(segment_iters=504)
    dt = time.time() - t0
    nprop = tomo.nchains_padded * (ITERS + ITERS // 2)
    print('\n%d cells x %d chains (%d padded chains), %d iters: '
          '%.0f s, %.0f proposals/s'
          % (NCELLS, CPC, tomo.nchains_padded, ITERS + ITERS // 2,
             dt, nprop / dt))

    # recovery: crustal Vs at 15 km and Moho depth (first vs>=4.1
    # crossing of the median profile) per cell
    dep = out['depth']
    med = out['vs_median']                      # (ncells, ndepth)
    i15 = np.argmin(np.abs(dep - 15.0))
    dv = np.abs(med[:, i15] - vcrust)
    moho_est = np.full(NCELLS, np.nan)
    for c in range(NCELLS):
        above = np.where(med[c] >= 4.1)[0]
        if above.size:
            moho_est[c] = dep[above[0]]
    dm = np.abs(moho_est - moho)
    print('crustal Vs @15 km: median |err| %.3f km/s, p90 %.3f '
          '(cells within 0.1: %.0f%%)'
          % (np.median(dv), np.percentile(dv, 90),
             100 * np.mean(dv < 0.1)))
    print('Moho depth: median |err| %.1f km, p90 %.1f '
          '(cells within 4 km: %.0f%%)'
          % (np.nanmedian(dm), np.nanpercentile(dm, 90),
             100 * np.mean(dm < 4.0)))
    ok = (np.median(dv) < 0.05) and (np.nanmedian(dm) < 3.0)
    print('TOMO RECOVERY', 'PASSED' if ok else 'FAILED')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
