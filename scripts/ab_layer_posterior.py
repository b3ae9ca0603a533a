"""A/B validation of the layer-count posterior (VERDICT round 1 §4)
and the sigma_RF DOF correction, at reference scale on the TPU.

Variants (each its own process — the warm cap is read at import):
  base        production config (warm caps on, fused cycles with
              per-chain dimension-slot mixture)
  hostslot    fused cycles with HOST-drawn per-cycle dimension slots
              (round-1 production scheme, four compiled variants)
  nocap       BAYHUNTER_WARM_CAP disabled
  randomscan  per-step random-scan dispatch instead of fused cycles
  dofcorr     gauss_dof_correction=True (sigma_RF unbiased law)
  pt          parallel tempering (ntemps=3, tmax=25, NCHAINS cold
              chains + 2 heated rungs each) — the cold posterior must
              match base within Monte Carlo error
  newton      BAYHUNTER_DIM_PREPASS=newton (one-call Newton
              recentering of the dim-move warm ring instead of the
              2-lane anchor ring; higher cap-reject rate, must not
              shift the posterior)

Usage:
  python scripts/ab_layer_posterior.py VARIANT [nchains] [burnin] [main]
  python scripts/ab_layer_posterior.py VARIANT --summarize
      (recompute the JSON summary from an existing /tmp/ab_layer_VARIANT
       run without touching the TPU — run under
       `env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu`)

Prints one JSON line with the pooled better-half posterior summaries:
layer-count histogram, Moho depth, noise posteriors, median logL,
throughput — append to VALIDATION.md for the record.
"""

import json
import os
import os.path as op
import shutil
import sys
import time

import numpy as np

SUMMARIZE = '--summarize' in sys.argv
argv = [a for a in sys.argv if a != '--summarize']
VARIANT = argv[1] if len(argv) > 1 else 'base'
NCHAINS = int(argv[2]) if len(argv) > 2 else 512
BURNIN = int(argv[3]) if len(argv) > 3 else 2048 * 16
MAIN = int(argv[4]) if len(argv) > 4 else 2048 * 8

assert VARIANT in ('base', 'hostslot', 'nocap', 'randomscan',
                   'dofcorr', 'pt', 'newton'), VARIANT
if VARIANT == 'nocap':
    os.environ['BAYHUNTER_WARM_CAP'] = '0'   # before package import
if VARIANT == 'newton':
    os.environ['BAYHUNTER_DIM_PREPASS'] = 'newton'

sys.path.insert(0, op.join(op.dirname(__file__), '..'))

import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  op.join(op.dirname(__file__), '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from bayhunter_tpu import (Targets, utils, MCMC_Optimizer,  # noqa: E402
                           SynthObs)
from bayhunter_tpu.models import Model  # noqa: E402

here = op.join(op.dirname(__file__), '..', 'tutorial')
savepath = op.join('/tmp', 'ab_layer_%s' % VARIANT)


def summarize(priors, dt=None):
    data = op.join(savepath, 'data')
    models = np.load(op.join(data, 'c_models.npy'))
    likes = np.load(op.join(data, 'c_likes.npy'))
    noises = np.load(op.join(data, 'c_noise.npy'))
    vpvss = np.load(op.join(data, 'c_vpvs.npy'))

    good = likes >= np.median(likes)   # pooled better half
    models, likes = models[good], likes[good]
    noises, vpvss = noises[good], vpvss[good]

    maxlay = int(priors['layers'][1]) + 1
    nlay = np.isfinite(models[:, :maxlay]).sum(axis=1)
    counts = np.bincount(nlay, minlength=maxlay + 1)
    hist = {int(i): round(float(c) / nlay.size, 3)
            for i, c in enumerate(counts) if c > 0}

    mohos = []
    for m, vv in zip(models[::max(1, len(models) // 20000)],
                     vpvss[::max(1, len(models) // 20000)]):
        vp, vs, h = Model.get_vp_vs_h(m, vv)
        zb = np.cumsum(h)
        # deepest interface with a vs jump > 0.2 into vs > 4.0
        cand = [zb[i] for i in range(len(vs) - 1)
                if vs[i + 1] > 4.0 and vs[i + 1] - vs[i] > 0.2]
        if cand:
            mohos.append(cand[-1])
    mohos = np.asarray(mohos)

    nprop = NCHAINS * (BURNIN + MAIN)
    print(json.dumps({
        'variant': VARIANT,
        'nchains': NCHAINS, 'burnin': BURNIN, 'main': MAIN,
        'proposals_per_s': round(nprop / dt, 0) if dt else None,
        'logL_median': round(float(np.median(likes)), 1),
        'nlay_hist': hist,
        'nlay_mode': int(np.argmax(counts)),
        'nlay_median': float(np.median(nlay)),
        'moho_median': round(float(np.median(mohos)), 2),
        'moho_std': round(float(np.std(mohos)), 2),
        'sigma_swd_median': round(float(np.median(noises[:, 1])), 5),
        'sigma_rf_median': round(float(np.median(noises[:, 3])), 5),
        'runtime_s': round(dt, 0) if dt else None,
    }))


def main():
    if op.exists(savepath):
        shutil.rmtree(savepath)

    priors, initparams = utils.load_params(op.join(here, 'config.ini'))
    xsw, _ysw = np.loadtxt(op.join(here, 'observed/st3_rdispph.dat')).T
    xrf, _yrf = np.loadtxt(op.join(here, 'observed/st3_prf.dat')).T

    noise = [0.0, 0.012, 0.98, 0.005]
    ysw_err = SynthObs.compute_expnoise(_ysw, corr=noise[0],
                                        sigma=noise[1])
    ysw = _ysw + ysw_err
    yrf_err = SynthObs.compute_gaussnoise(_yrf, corr=noise[2],
                                          sigma=noise[3])
    yrf = _yrf + yrf_err

    target1 = Targets.RayleighDispersionPhase(xsw, ysw, yerr=ysw_err)
    target2 = Targets.PReceiverFunction(xrf, yrf)
    target2.moddata.plugin.set_modelparams(gauss=1., water=0.01, p=6.4)
    targets = Targets.JointTarget(targets=[target1, target2])

    priors.update({'mohoest': None, 'rfnoise_corr': 0.98,
                   'swdnoise_corr': 0.})
    initparams.update({'nchains': NCHAINS,
                       'iter_burnin': BURNIN,
                       'iter_main': MAIN,
                       'propdist': (0.025, 0.025, 0.015, 0.005, 0.005),
                       'savepath': savepath})
    if VARIANT == 'randomscan':
        initparams['fused_cycles'] = False
    if VARIANT == 'hostslot':
        initparams['dim_mixture'] = 'host'
    if VARIANT == 'dofcorr':
        initparams['gauss_dof_correction'] = True
    if VARIANT == 'pt':
        initparams.update({'ntemps': 3, 'tmax': 25.0,
                           'swap_every': 1})

    t0 = time.time()
    optimizer = MCMC_Optimizer(targets, initparams=initparams,
                               priors=priors, random_seed=7)
    optimizer.mp_inversion(baywatch=False)
    dt = time.time() - t0
    nprop = NCHAINS * (BURNIN + MAIN)

    from bayhunter_tpu.plotting import PlotFromStorage
    configfile = op.join(savepath, 'data',
                         '%s_config.pkl' % initparams['station'])
    obj = PlotFromStorage(configfile)
    obj.save_final_distribution(maxmodels=100000, dev=0.05)

    summarize(priors, dt)


if __name__ == '__main__':
    if SUMMARIZE:
        priors, _ = utils.load_params(op.join(here, 'config.ini'))
        summarize(priors)
    else:
        main()
