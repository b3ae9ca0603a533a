"""Unified model kernel (ops/pallas_prep.model_operands_t) parity.

The kernel fuses the voronoi conversion (reference src/Models.py:
40-52), the prior validity chain (src/SingleChain.py:330-392), the
SWD lower-bound/max-velocity prep incl. the gtsolh Newton
(surfdisp96.f:140-217, 367-388), the spherical flattening
(surfdisp96.f:486-553) and the RF operand prep (model.cpp:223-251,
greens.cpp:19-112) into ONE pallas program.  Covered here:

  * validity row BITWISE vs model_is_valid_T across lvz/hvz/mantle
    configurations on invalid-heavy ensembles;
  * walker prop stacks / cm / bx / top vs the XLA T-layout helpers
    (structural outputs exact, arithmetic to Mosaic-vs-XLA
    FMA-contraction tolerance);
  * RF coefs/pack vs rf_operands_t (the already-tested RF prep
    kernel);
  * the full production step with BAYHUNTER_MODEL_KERNEL on vs off:
    counters and trajectories equal on a short horizon (marginal
    accepts can flip only at f32-tolerance boundaries; the seeds
    here do not sit on one).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from bayhunter_tpu.ops.pallas_prep import (model_operands_t,
                                           rf_operands_t)
from bayhunter_tpu.ops.swd import gtsolh, sphere_flatten_T
from bayhunter_tpu.ops import voronoi as V

CFGT = (1, 20, 2.0, 5.0, 0.0, 60.0, 0.1, None, None)
PRIORS = {'layers': (1, 20), 'vs': (2.0, 5.0), 'z': (0.0, 60.0)}


def _ensemble(C, nl=21, seed=7, messy=False):
    rs = np.random.RandomState(seed)
    n = rs.randint(2, 21 if messy else 10, C).astype(np.int32)
    lo, hi = (1.8, 5.2) if messy else (2.05, 4.95)
    vs = np.sort(rs.uniform(lo, hi, (C, nl)), axis=1)
    zmax = 70.0 if messy else 58.0
    z = np.sort(rs.uniform(0.0, zmax, (C, nl)), axis=1)
    if messy:
        z[::5, 3] = z[::5, 2] + 0.01          # thin-layer violations
    else:
        for i in range(C):
            z[i, n[i]:] = 120.0 + np.arange(nl - n[i])
    vpvs = rs.uniform(1.6, 1.9, C).astype(np.float32)
    vs_t = jnp.asarray(vs.T, jnp.float32)
    z_t = jnp.asarray(z.T, jnp.float32)
    return (*V.sort_by_depth_T(vs_t, z_t, jnp.asarray(n)),
            jnp.asarray(n), jnp.asarray(vpvs, jnp.float32))


def test_validity_bitwise():
    vs_s, z_s, n, vpvs = _ensemble(130, messy=True)
    for lvz, hvz in ((None, None), (0.3, None), (None, 0.5),
                     (0.2, 0.4)):
        for mantle in (None, (4.2, 1.8)):
            cfgt = CFGT[:7] + (lvz, hvz)
            valid_k, _ = model_operands_t(
                vs_s, z_s, n, vpvs, (('swd', 2, 0),), cfgt,
                mantle=mantle, interpret=True)
            valid_x = V.model_is_valid_T(vs_s, z_s, n, vpvs, PRIORS,
                                         0.1, lvz, hvz, mantle=mantle)
            assert np.array_equal(np.asarray(valid_k),
                                  np.asarray(valid_x)), (lvz, hvz,
                                                         mantle)
            assert 0 < int(valid_x.sum()) < 130  # both classes hit


def test_swd_operands_match_xla():
    nl = 21
    vs_s, z_s, n, vpvs = _ensemble(52)
    specs = (('swd', 2, 0), ('swd', 1, 0), ('swd', 2, 1),
             ('swd', 1, 1))
    _, res = model_operands_t(vs_s, z_s, n, vpvs, specs, CFGT,
                              interpret=True)
    ht, vpt, vst, rhot = V.voronoi_to_layers_T(vs_s, z_s, n, vpvs)

    # cm/bx/top reference: the XLA T-path logic (ops/swd.py:927-942)
    solid = vst > 0.01
    cand = jnp.where(solid, vst, vpt)
    jmn = jnp.argmin(cand, axis=0)
    at = jnp.arange(nl)[:, None] == jmn[None, :]
    betmn = jnp.sum(jnp.where(at, cand, 0.0), axis=0)
    a_mn = jnp.sum(jnp.where(at, vpt, 0.0), axis=0)
    b_mn = jnp.sum(jnp.where(at, vst, 0.0), axis=0)
    jsol = jnp.any(at & solid, axis=0)
    cm_x = 0.95 * 0.90 * jnp.where(jsol, gtsolh(a_mn, b_mn), betmn)
    bx_x = jnp.max(vst, axis=0)

    for (kind, iwave, iflsph), (props, cm, bx, top) in zip(specs,
                                                           res):
        if iflsph:
            d_x, a_x, b_x, r_x = sphere_flatten_T(ht, vpt, vst, rhot,
                                                  iwave)
        else:
            d_x, a_x, b_x, r_x = ht, vpt, vst, rhot
        if iwave == 1:
            planes = (d_x, b_x, r_x)
        else:
            planes = (d_x, a_x, b_x, r_x)
        for k, px in enumerate(planes):
            np.testing.assert_allclose(
                np.asarray(props[k * nl:(k + 1) * nl]),
                np.asarray(px), rtol=0, atol=3e-6)
        # cm/bx are computed from the FLATTENED planes per target
        if iflsph:
            solid_f = b_x > 0.01
            cand_f = jnp.where(solid_f, b_x, a_x)
            jmn_f = jnp.argmin(cand_f, axis=0)
            at_f = jnp.arange(nl)[:, None] == jmn_f[None, :]
            betmn_f = jnp.sum(jnp.where(at_f, cand_f, 0.0), axis=0)
            amn_f = jnp.sum(jnp.where(at_f, a_x, 0.0), axis=0)
            bmn_f = jnp.sum(jnp.where(at_f, b_x, 0.0), axis=0)
            jsol_f = jnp.any(at_f & solid_f, axis=0)
            cmr = 0.95 * 0.90 * jnp.where(jsol_f,
                                          gtsolh(amn_f, bmn_f),
                                          betmn_f)
            bxr = jnp.max(b_x, axis=0)
        else:
            cmr, bxr = cm_x, bx_x
        np.testing.assert_allclose(np.asarray(cm), np.asarray(cmr),
                                   rtol=0, atol=3e-6)
        np.testing.assert_allclose(np.asarray(bx), np.asarray(bxr),
                                   rtol=0, atol=3e-6)
        top_x = jnp.max(jnp.where(d_x > 0,
                                  jnp.arange(nl)[:, None], -1),
                        axis=0)
        assert np.array_equal(np.asarray(top),
                              np.asarray(top_x, np.float32))


def test_rf_operands_match_prep_kernel():
    vs_s, z_s, n, vpvs = _ensemble(21)   # odd C exercises padding
    p = 6.4 * 0.00899
    _, res = model_operands_t(vs_s, z_s, n, vpvs,
                              (('rf', p, 0, True),), CFGT,
                              interpret=True)
    coefs_k, pack_k = res[0]
    ht, vpt, vst, rhot = V.voronoi_to_layers_T(vs_s, z_s, n, vpvs)
    coefs_r, pack_r = rf_operands_t(ht, vpt, vst, rhot, p, 0, True,
                                    interpret=True)
    np.testing.assert_allclose(np.asarray(coefs_k),
                               np.asarray(coefs_r), rtol=0,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pack_k),
                               np.asarray(pack_r), rtol=0, atol=1e-6)


def test_step_model_kernel_arms_agree():
    """Production step with the model kernel on vs off: same
    counters/trajectories on a short horizon (the arms differ by
    Mosaic-vs-XLA FMA contraction only)."""
    from test_dim_reject_pin import (_bench_config_sampler,
                                     _grown_states)

    def run(arm):
        os.environ['BAYHUNTER_MODEL_KERNEL'] = arm
        try:
            sampler, eval_fn = _bench_config_sampler()
            states = _grown_states(sampler, eval_fn, 12)
            out = sampler.step_fn(states, 0)
            out2 = sampler.cycle_mixed_fn(states)
            jax.block_until_ready(out2.logL)
            return out, out2
        finally:
            os.environ.pop('BAYHUNTER_MODEL_KERNEL', None)

    a = run('0')
    b = run('1')
    for sa, sb in zip(a, b):
        for f in ('n', 'accepted', 'proposed', 'fwdfail', 'key'):
            assert np.array_equal(np.asarray(getattr(sa, f)),
                                  np.asarray(getattr(sb, f))), f
        np.testing.assert_allclose(np.asarray(sa.logL),
                                   np.asarray(sb.logL), rtol=0,
                                   atol=0.5)
