"""Transposed-layout (chains-on-lanes) parity tests.

The production batch step can run its propose -> voronoi -> validity
-> operand-pack chain in the transposed (NL, C) layout
(BAYHUNTER_STEP_T, chain.propose_T/accept_T): model vectors ride the
128-wide lane axis, so every elementwise op is full-lane without the
flat-lane barrier fences, and the solver kernels take the transposed
operands directly (one stacked walker props array; one packed RF
per-chain block).  Covered here:

  * voronoi/validity/sort T variants vs the row-major batch paths
    (sort bitwise; conversions to f32-reassociation tolerance);
  * the walker's ``layout_t`` input path — BITWISE against the
    row-major pack (same kernel, same lanes);
  * ``synrf_batch(layout_t=True)`` — BITWISE against row-major;
  * the full production step (step_fn static moves + fused mixed
    cycle): trajectories, counters, keys and accept decisions are
    BITWISE identical between layouts; logL/misfits/cached
    synthetics agree to f32 fusion-reassociation tolerance (the
    barriered flat-lane graph and the transposed graph contract
    FMAs differently — the same equivalence class as the documented
    sharded-vs-unsharded differences).
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))

from bayhunter_tpu.ops import voronoi as V

BITWISE_FIELDS = ('vs', 'z', 'n', 'vpvs', 'noise', 'key', 'propdist',
                  'accepted', 'proposed', 'fwdfail', 'iiter')


def _models(C, nl=21, seed=1):
    rs = np.random.RandomState(seed)
    h = np.zeros((C, nl), np.float32)
    vs = np.zeros((C, nl), np.float32)
    for c in range(C):
        n = rs.randint(2, 9)
        hh = rs.uniform(2, 12, n)
        hh[-1] = 0
        vv = np.sort(rs.uniform(2.1, 4.8, n))
        h[c, :n] = hh
        vs[c, :n] = vv
        vs[c, n:] = vv[-1]
    return h, vs


def test_voronoi_t_matches_batch():
    rs = np.random.RandomState(1)
    C, nl = 37, 21
    vs = rs.uniform(2, 5, (C, nl)).astype(np.float32)
    z = np.sort(rs.uniform(0, 60, (C, nl)), axis=1).astype(np.float32)
    n = rs.randint(2, 10, C).astype(np.int32)
    vpvs = rs.uniform(1.6, 1.9, C).astype(np.float32)
    priors = {'layers': (1, 20), 'vs': (2.0, 5.0), 'z': (0.0, 60.0)}
    for mantle in (None, (4.0, 1.8)):
        ref = V.voronoi_to_layers_batch(
            jnp.asarray(vs), jnp.asarray(z), jnp.asarray(n),
            jnp.asarray(vpvs), mantle=mantle)
        t = V.voronoi_to_layers_T(
            jnp.asarray(vs.T), jnp.asarray(z.T), jnp.asarray(n),
            jnp.asarray(vpvs), mantle=mantle)
        for a, b in zip(ref, t):
            np.testing.assert_allclose(np.asarray(a),
                                       np.asarray(b).T, atol=1e-6)
        vok = V.model_is_valid_batch(
            jnp.asarray(vs), jnp.asarray(z), jnp.asarray(n),
            jnp.asarray(vpvs), priors, 0.1, 0.2, 0.3, mantle=mantle)
        vok_t = V.model_is_valid_T(
            jnp.asarray(vs.T), jnp.asarray(z.T), jnp.asarray(n),
            jnp.asarray(vpvs), priors, 0.1, 0.2, 0.3, mantle=mantle)
        assert np.array_equal(np.asarray(vok), np.asarray(vok_t))
    s_vs, s_z = jax.vmap(V.sort_by_depth)(
        jnp.asarray(vs), jnp.asarray(z), jnp.asarray(n))
    t_vs, t_z = V.sort_by_depth_T(
        jnp.asarray(vs.T), jnp.asarray(z.T), jnp.asarray(n))
    assert np.array_equal(np.asarray(s_vs), np.asarray(t_vs).T)
    assert np.array_equal(np.asarray(s_z), np.asarray(t_z).T)


def test_walker_layout_t_bitwise():
    from bayhunter_tpu.ops.pallas_walk import warm_roots_walk
    from bayhunter_tpu.ops.swd import DDC
    rs = np.random.RandomState(2)
    C, R = 52, 21
    h, vs = _models(C, seed=2)
    vp = vs * 1.73
    rho = vp * 0.32 + 0.77
    periods = np.linspace(1, 41, R).astype(np.float32)
    om = np.broadcast_to(2 * np.pi / periods, (C, R)).astype(
        np.float32)
    cprev = (np.broadcast_to(0.9 * vs[:, :1], (C, R))
             + rs.uniform(-0.01, 0.01, (C, R))).astype(np.float32)
    cm = (0.8 * vs[:, :1].copy()).astype(np.float32)
    bx = vs.max(axis=1, keepdims=True).astype(np.float32)
    kw = dict(ring_k=8, trips=2, nbisect=1, newton_iters=2,
              newton_maxshift=1.0, interpret=True)
    for iwave in (2, 1):
        a = warm_roots_walk(
            jnp.asarray(h), jnp.asarray(vp), jnp.asarray(vs),
            jnp.asarray(rho), jnp.asarray(om), jnp.asarray(cprev),
            jnp.asarray(cm), jnp.asarray(bx), float(DDC),
            iwave=iwave, **kw)
        b = warm_roots_walk(
            jnp.asarray(h.T), jnp.asarray(vp.T), jnp.asarray(vs.T),
            jnp.asarray(rho.T), jnp.asarray(om), jnp.asarray(cprev),
            jnp.asarray(cm), jnp.asarray(bx), float(DDC),
            iwave=iwave, layout_t=True, **kw)
        for x, y in zip(a, b):
            assert np.array_equal(np.asarray(x), np.asarray(y)), iwave


def test_synrf_batch_layout_t():
    """Row-major vs transposed RF: the XLA-assembled T arm is
    BITWISE; the operand-prep kernel arm (production default,
    ops/pallas_prep.py — flattening/coefficients/scalars in-kernel)
    matches to Mosaic-vs-XLA FMA-contraction tolerance."""
    from bayhunter_tpu.ops.rf import synrf_batch
    C = 8
    h, vs = _models(C, seed=4)
    vp = vs * 1.73
    rho = vp * 0.32 + 0.77
    poisson = jnp.full((C,), (2 - 1.73 ** 2) / (2 - 2 * 1.73 ** 2),
                       jnp.float32)
    nsv = jnp.asarray(vs[:, 0])
    a = synrf_batch(jnp.asarray(h), jnp.asarray(vp), jnp.asarray(vs),
                    jnp.asarray(rho), 500.0, 225.0, 6.4, 1.0, 512,
                    5.0, 5.0, nsv, poisson, wave_type=0,
                    interpret=True)
    b = synrf_batch(jnp.asarray(h.T), jnp.asarray(vp.T),
                    jnp.asarray(vs.T), jnp.asarray(rho.T), 500.0,
                    225.0, 6.4, 1.0, 512, 5.0, 5.0, nsv, poisson,
                    wave_type=0, layout_t=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=2e-6)
    os.environ['BAYHUNTER_RF_PREP_KERNEL'] = '0'
    try:
        c = synrf_batch(jnp.asarray(h.T), jnp.asarray(vp.T),
                        jnp.asarray(vs.T), jnp.asarray(rho.T), 500.0,
                        225.0, 6.4, 1.0, 512, 5.0, 5.0, nsv, poisson,
                        wave_type=0, layout_t=True, interpret=True)
    finally:
        os.environ.pop('BAYHUNTER_RF_PREP_KERNEL', None)
    assert np.array_equal(np.asarray(a), np.asarray(c))


def _run_steps(arm):
    from test_dim_reject_pin import (_bench_config_sampler,
                                     _grown_states)
    os.environ['BAYHUNTER_STEP_T'] = arm
    # the bitwise-trajectory comparison needs the XLA-assembled
    # operand arms: the prep/model KERNELS' flattening/coefficients
    # contract FMAs differently from XLA (own tolerance tests above
    # and in test_model_kernel), which could flip marginal accepts
    os.environ['BAYHUNTER_RF_PREP_KERNEL'] = '0'
    os.environ['BAYHUNTER_MODEL_KERNEL'] = '0'
    try:
        sampler, eval_fn = _bench_config_sampler()
        states = _grown_states(sampler, eval_fn, 12)
        outs = [sampler.step_fn(states, 0),
                sampler.step_fn(states, 3)]
        outs.append(sampler.cycle_mixed_fn(states))
        return outs
    finally:
        os.environ.pop('BAYHUNTER_STEP_T', None)
        os.environ.pop('BAYHUNTER_RF_PREP_KERNEL', None)
        os.environ.pop('BAYHUNTER_MODEL_KERNEL', None)


def test_step_t_matches_row_major():
    a = _run_steps('0')
    b = _run_steps('1')
    for sa, sb in zip(a, b):
        for field in BITWISE_FIELDS:
            xa = np.asarray(getattr(sa, field))
            xb = np.asarray(getattr(sb, field))
            assert np.array_equal(xa, xb), field
        np.testing.assert_allclose(np.asarray(sa.logL),
                                   np.asarray(sb.logL),
                                   rtol=0, atol=0.5)
        np.testing.assert_allclose(np.asarray(sa.misfits),
                                   np.asarray(sb.misfits),
                                   rtol=0, atol=1e-6)
        for la, lb in zip(jax.tree.leaves(sa.cache),
                          jax.tree.leaves(sb.cache)):
            np.testing.assert_allclose(np.asarray(la),
                                       np.asarray(lb),
                                       rtol=0, atol=1e-6)
