"""Pallas secular kernel vs the XLA path (interpret mode on CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bayhunter_tpu.ops.pallas_secular import (dltar1_pallas,
                                              dltar1_pallas_single,
                                              dltar4_pallas,
                                              dltar4_pallas_single)
from bayhunter_tpu.ops.swd import dltar1, dltar4


def _assert_roots_close(a, b, p90=2e-5, amax=5e-4):
    """Dual-threshold parity for root solves: the pallas and XLA
    secular kernels round differently in the last ulp, so a lane whose
    sign flips exactly at a refinement grid point can land in the
    adjacent sub-cell — the two (individually accurate) paths then
    differ by up to the final bracket width.  The bulk must agree
    tightly; the max only to the bracket bound."""
    d = np.abs(np.asarray(a) - np.asarray(b))
    assert np.percentile(d, 90) < p90, (np.percentile(d, 90), p90)
    assert d.max() < amax, (d.max(), amax)


def _model(NL=21):
    h = np.zeros(NL)
    h[:4] = [5., 23., 8., 0.]
    vs = np.full(NL, 4.4)
    vs[:4] = [2.7, 3.6, 3.8, 4.4]
    vp = vs * 1.73
    rho = vp * 0.32 + 0.77
    return h, vp, vs, rho


def test_pallas_secular_matches_xla():
    h, vp, vs, rho = _model()
    rs = np.random.RandomState(0)
    C, L = 4, 256
    per = rs.uniform(1, 41, L)
    omega = (2 * np.pi / per).astype(np.float32)
    c = rs.uniform(2.0, 4.3, (C, L)).astype(np.float32)
    wv = omega[None, :] / c
    om = np.broadcast_to(omega, (C, L)).astype(np.float32)

    D = jnp.tile(jnp.asarray(h, jnp.float32), (C, 1))
    A = jnp.tile(jnp.asarray(vp, jnp.float32), (C, 1))
    B = jnp.tile(jnp.asarray(vs, jnp.float32), (C, 1))
    R = jnp.tile(jnp.asarray(rho, jnp.float32), (C, 1))

    out = dltar4_pallas(jnp.asarray(wv), jnp.asarray(om), D, A, B, R,
                        interpret=True)
    ref = jax.vmap(lambda w, o, d, a, b, r:
                   dltar4(w, o, d, a, b, r, jnp.asarray(False)))(
        jnp.asarray(wv), jnp.asarray(om), D, A, B, R)
    out_n, ref_n = np.asarray(out), np.asarray(ref)
    assert np.all(np.sign(out_n) == np.sign(ref_n))
    np.testing.assert_allclose(out_n, ref_n, rtol=1e-5, atol=1e-6)


def test_pallas_secular_water_layer():
    h, vp, vs, rho = _model(8)
    vs[0] = 0.0  # surface water layer
    vp[0] = 1.5
    rho[0] = 1.0
    h[0] = 2.0
    rs = np.random.RandomState(1)
    L = 128
    per = rs.uniform(1, 41, L)
    omega = (2 * np.pi / per).astype(np.float32)
    wv = (omega / rs.uniform(2.0, 4.3, L)).astype(np.float32)

    out = dltar4_pallas_single(jnp.asarray(wv), jnp.asarray(omega),
                               jnp.asarray(h, jnp.float32),
                               jnp.asarray(vp, jnp.float32),
                               jnp.asarray(vs, jnp.float32),
                               jnp.asarray(rho, jnp.float32),
                               interpret=True)
    ref = dltar4(jnp.asarray(wv), jnp.asarray(omega),
                 jnp.asarray(h, jnp.float32),
                 jnp.asarray(vp, jnp.float32),
                 jnp.asarray(vs, jnp.float32),
                 jnp.asarray(rho, jnp.float32), jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_pallas_love_secular_matches_xla():
    h, vp, vs, rho = _model()
    rs = np.random.RandomState(3)
    C, L = 4, 256
    per = rs.uniform(1, 41, L)
    omega = (2 * np.pi / per).astype(np.float32)
    c = rs.uniform(2.0, 4.3, (C, L)).astype(np.float32)
    wv = omega[None, :] / c
    om = np.broadcast_to(omega, (C, L)).astype(np.float32)

    D = jnp.tile(jnp.asarray(h, jnp.float32), (C, 1))
    A = jnp.tile(jnp.asarray(vp, jnp.float32), (C, 1))
    B = jnp.tile(jnp.asarray(vs, jnp.float32), (C, 1))
    R = jnp.tile(jnp.asarray(rho, jnp.float32), (C, 1))

    out = dltar1_pallas(jnp.asarray(wv), jnp.asarray(om), D, B, R,
                        interpret=True)
    ref = jax.vmap(lambda w, o, d, a, b, r:
                   dltar1(w, o, d, a, b, r, jnp.asarray(False)))(
        jnp.asarray(wv), jnp.asarray(om), D, A, B, R)
    out_n, ref_n = np.asarray(out), np.asarray(ref)
    assert np.all(np.sign(out_n) == np.sign(ref_n))
    np.testing.assert_allclose(out_n, ref_n, rtol=1e-5, atol=1e-6)


def test_pallas_love_secular_water_layer():
    h, vp, vs, rho = _model(8)
    vs[0] = 0.0  # surface water layer (skipped, llw=2)
    vp[0] = 1.5
    rho[0] = 1.0
    h[0] = 2.0
    rs = np.random.RandomState(4)
    L = 128
    per = rs.uniform(1, 41, L)
    omega = (2 * np.pi / per).astype(np.float32)
    wv = (omega / rs.uniform(2.0, 4.3, L)).astype(np.float32)

    out = dltar1_pallas_single(jnp.asarray(wv), jnp.asarray(omega),
                               jnp.asarray(h, jnp.float32),
                               jnp.asarray(vs, jnp.float32),
                               jnp.asarray(rho, jnp.float32),
                               interpret=True)
    ref = dltar1(jnp.asarray(wv), jnp.asarray(omega),
                 jnp.asarray(h, jnp.float32),
                 jnp.asarray(vp, jnp.float32),
                 jnp.asarray(vs, jnp.float32),
                 jnp.asarray(rho, jnp.float32), jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('mode', ['branch', 'loop'])
def test_pallas_secular_dynamic_layer_skip(mode):
    """Heterogeneous per-chain layer counts across tiles: both dynamic
    layer-skip modes (per-layer scf.if 'branch' and dynamic-trip
    fori 'loop', pallas_secular.DYNAMIC_NL_MODE) must reproduce the
    full XLA recursion — the skipped identity layers renormalize by
    exactly 1 once any active layer has renormalized, so values (not
    just signs) agree to f32 rounding for every n >= 2.  The test
    forces each mode on and calls the unjitted wrappers (the jitted
    ones bake the flag in at trace time)."""
    from bayhunter_tpu.ops import pallas_secular
    rs = np.random.RandomState(11)
    C, L, NL = 16, 256, 21
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    # tile 0: small models (n in 2..6); tile 1: up to full width —
    # exercises different per-tile top indices including no-skip
    for i in range(C):
        n = rs.randint(2, 7) if i < 8 else rs.randint(7, NL + 1)
        z = np.sort(rs.uniform(2, 55, n))
        v = np.sort(rs.uniform(2.3, 4.5, n))
        H[i, :n - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :n] = v
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77

    per = rs.uniform(1, 41, L)
    omega = (2 * np.pi / per).astype(np.float32)
    c = rs.uniform(2.0, 4.3, (C, L)).astype(np.float32)
    wv = omega[None, :] / c
    om = np.broadcast_to(omega, (C, L)).astype(np.float32)
    D, A, B, R = (jnp.asarray(x) for x in (H, VP, VS, RHO))

    saved = pallas_secular.DYNAMIC_NL_MODE
    pallas_secular.DYNAMIC_NL_MODE = mode
    try:
        out4 = dltar4_pallas.__wrapped__(
            jnp.asarray(wv), jnp.asarray(om), D, A, B, R,
            interpret=True)
        out1 = dltar1_pallas.__wrapped__(
            jnp.asarray(wv), jnp.asarray(om), D, B, R,
            interpret=True)
    finally:
        pallas_secular.DYNAMIC_NL_MODE = saved
    ref4 = jax.vmap(lambda w, o, d, a, b, r:
                    dltar4(w, o, d, a, b, r, jnp.asarray(False)))(
        jnp.asarray(wv), jnp.asarray(om), D, A, B, R)
    # value tolerance: identity (padded) layers renormalize by exactly
    # 1 only AFTER some active layer has renormalized; the number of
    # identity slots a chain executes is the TILE max layer count, so
    # widening C_TILE (8 -> 16 default, round 3) lets small models in
    # a deep tile accumulate a few more f32 roundings (observed
    # 3.4e-6 on O(1) normalized values at 16).  The tolerance scales
    # with the ACTIVE tile width so the original 8-wide bound stays
    # pinned where it held.  Signs are exact; root accuracy is pinned
    # separately (dual-threshold root parity).
    if pallas_secular.C_TILE <= 8:
        rtol, atol = 2e-5, 2e-6
    else:
        rtol, atol = 1e-4, 1e-5
    assert np.all(np.sign(np.asarray(out4)) == np.sign(np.asarray(ref4)))
    np.testing.assert_allclose(np.asarray(out4), np.asarray(ref4),
                               rtol=rtol, atol=atol)

    ref1 = jax.vmap(lambda w, o, d, a, b, r:
                    dltar1(w, o, d, a, b, r, jnp.asarray(False)))(
        jnp.asarray(wv), jnp.asarray(om), D, A, B, R)
    assert np.all(np.sign(np.asarray(out1)) == np.sign(np.asarray(ref1)))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               rtol=rtol, atol=atol)


@pytest.mark.parametrize('igr', [0, 1])
def test_batch_solver_love_matches_vmap_interpret(igr):
    """surfdisp_roots_batch with iwave=1 (pallas Love kernel,
    interpret mode) must agree with the vmapped per-chain solver."""
    from bayhunter_tpu.ops.swd import (surfdisp_roots,
                                       surfdisp_roots_batch)
    rs = np.random.RandomState(5)
    NL, C = 9, 5
    per = jnp.asarray(np.linspace(2, 35, 9), jnp.float32)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 5)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    args = [jnp.asarray(x) for x in (H, VP, VS, RHO)]

    # group velocities difference two phase solves 1% apart in period,
    # amplifying the ~1e-6 km/s root-refinement resolution ~100x
    atol = 1e-4 if igr else 2e-5

    cg_v, err_v, roots = jax.vmap(
        lambda a, b, c, d: surfdisp_roots(a, b, c, d, per, iwave=1,
                                          igr=igr))(*args)
    cg_b, err_b, _ = surfdisp_roots_batch(*args, per, iwave=1,
                                          igr=igr, interpret=True)
    _assert_roots_close(cg_b, cg_v, p90=atol)
    np.testing.assert_array_equal(np.asarray(err_b), np.asarray(err_v))

    # warm path, displaced off the DDC grid
    rp = roots + 0.0117
    w_v = jax.vmap(lambda a, b, c, d, cp: surfdisp_roots(
        a, b, c, d, per, c_prev=cp, iwave=1, igr=igr)[0])(*args, rp)
    w_b = surfdisp_roots_batch(*args, per, c_prev=rp, iwave=1,
                               igr=igr, interpret=True)[0]
    _assert_roots_close(w_b, w_v, p90=atol)


def test_batch_solver_matches_vmap_interpret():
    """surfdisp_roots_batch (pallas, interpret mode on CPU) must agree
    with the vmapped per-chain solver, cold and warm."""
    import jax
    from bayhunter_tpu.ops.swd import (surfdisp_roots,
                                       surfdisp_roots_batch)
    rs = np.random.RandomState(2)
    NL, C = 9, 5  # deliberately NOT a multiple of the 8-chain tile
    per = jnp.asarray(np.linspace(2, 35, 11), jnp.float32)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 5)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    args = [jnp.asarray(x) for x in (H, VP, VS, RHO)]

    cg_v, err_v, roots = jax.vmap(
        lambda a, b, c, d: surfdisp_roots(a, b, c, d, per))(*args)
    cg_b, err_b, _ = surfdisp_roots_batch(*args, per, interpret=True)
    _assert_roots_close(cg_b, cg_v)
    np.testing.assert_array_equal(np.asarray(err_b), np.asarray(err_v))

    # warm path, displaced off the DDC grid (aligned c_prev puts
    # ring points exactly on the roots -> degenerate sign flips)
    rp = roots + 0.0117
    w_v = jax.vmap(lambda a, b, c, d, cp: surfdisp_roots(
        a, b, c, d, per, c_prev=cp)[0])(*args, rp)
    w_b = surfdisp_roots_batch(*args, per, c_prev=rp,
                               interpret=True)[0]
    _assert_roots_close(w_b, w_v)


def test_rf_batch_pallas_matches_vmap_interpret():
    """synrf_batch (pallas transmission kernel, interpret mode) must
    match the vmapped XLA synrf on the final receiver functions."""
    import jax
    from bayhunter_tpu.ops.rf import synrf, synrf_batch
    rs = np.random.RandomState(1)
    NL, C = 8, 3
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 5)
        H[i, :nlay - 1] = rs.uniform(3, 20, nlay - 1)
        vv = np.sort(rs.uniform(2.5, 4.5, nlay))
        VS[i] = vv[-1]
        VS[i, :nlay] = vv
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    QP = np.full((C, NL), 500., np.float32)
    QS = np.full((C, NL), 225., np.float32)

    for wave in (0, 1):
        rf_b = synrf_batch(
            jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
            jnp.asarray(RHO), jnp.asarray(QP), jnp.asarray(QS),
            6.4, 1.0, 256, 5.0, 5.0, VS[:, 0],
            np.full(C, 0.25, np.float32), wave_type=wave,
            interpret=True)
        rf_v = jax.vmap(
            lambda a, b, c, d, n: synrf(
                a, b, c, d, jnp.asarray(QP[0]), jnp.asarray(QS[0]),
                6.4, 1.0, 256, 5.0, 5.0, n, 0.25,
                wave_type=wave)[2])(
            jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
            jnp.asarray(RHO), jnp.asarray(VS[:, 0]))
        np.testing.assert_allclose(np.asarray(rf_b), np.asarray(rf_v),
                                   atol=5e-5)


def test_rf_coeff_hoist_matches_in_kernel(monkeypatch):
    """The XLA-precomputed interface-coefficient path (default) must
    match the in-kernel coefficient computation it replaced.  The
    coefficients are frequency-independent per-(chain, layer) scalars;
    hoisting them out of the frequency-lane kernel removed ~98% of
    the kernel's per-call compute, and this pins the two paths to
    near-bit agreement (same formulas, different vector shapes)."""
    from bayhunter_tpu.ops.rf import synrf_batch
    rs = np.random.RandomState(11)
    NL, C = 9, 5
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, NL)
        H[i, :nlay - 1] = rs.uniform(2, 15, nlay - 1)
        vv = np.sort(rs.uniform(2.4, 4.6, nlay))
        VS[i] = vv[-1]
        VS[i, :nlay] = vv
    VP = VS * 1.74
    RHO = VP * 0.32 + 0.77
    QP = np.full((C, NL), 500., np.float32)
    QS = np.full((C, NL), 225., np.float32)

    def run():
        return np.asarray(synrf_batch(
            jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
            jnp.asarray(RHO), jnp.asarray(QP), jnp.asarray(QS),
            6.4, 1.0, 256, 5.0, 5.0, VS[:, 0],
            np.full(C, 0.25, np.float32), interpret=True))

    monkeypatch.setenv('BAYHUNTER_RF_COEFF_XLA', '1')
    rf_hoist = run()
    monkeypatch.setenv('BAYHUNTER_RF_COEFF_XLA', '0')
    rf_kernel = run()
    np.testing.assert_allclose(rf_hoist, rf_kernel, atol=2e-6)


@pytest.mark.parametrize('mode', ['branch', 'loop'])
def test_rf_batch_dynamic_skip_multi_tile(mode):
    """Regression: the RF kernel's dynamic layer skip must read ITS
    OWN tile's top-layer index (top_ref[program_id], not tile 0's).
    Tile 0 holds shallow 2-layer models and tile 1 deep near-full-
    width models — with the bug, tile 1's recursion truncates at tile
    0's depth and its RFs are grossly wrong (this is exactly the
    resorted production layout, which sorts shallow models first; it
    broke posterior validation on the real chip before the fix).
    Covers both skip implementations: per-layer lax.cond ('branch')
    and the dynamic-trip fori_loop over layer-major props ('loop')."""
    import jax
    from bayhunter_tpu.ops.rf import synrf, synrf_batch
    rs = np.random.RandomState(7)
    NL, C = 12, 16
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 4) if i < 8 else rs.randint(8, NL + 1)
        H[i, :nlay - 1] = rs.uniform(2, 12, nlay - 1)
        vv = np.sort(rs.uniform(2.5, 4.5, nlay))
        VS[i] = vv[-1]
        VS[i, :nlay] = vv
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    QP = np.full((C, NL), 500., np.float32)
    QS = np.full((C, NL), 225., np.float32)

    from bayhunter_tpu.ops import pallas_rf
    saved = pallas_rf.DYNAMIC_NL
    pallas_rf.DYNAMIC_NL = mode
    try:
        rf_b = synrf_batch(
            jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
            jnp.asarray(RHO), jnp.asarray(QP), jnp.asarray(QS),
            6.4, 1.0, 256, 5.0, 5.0, VS[:, 0],
            np.full(C, 0.25, np.float32), interpret=True)
    finally:
        pallas_rf.DYNAMIC_NL = saved
    rf_v = jax.vmap(
        lambda a, b, c, d, n: synrf(
            a, b, c, d, jnp.asarray(QP[0]), jnp.asarray(QS[0]),
            6.4, 1.0, 256, 5.0, 5.0, n, 0.25)[2])(
        jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
        jnp.asarray(RHO), jnp.asarray(VS[:, 0]))
    np.testing.assert_allclose(np.asarray(rf_b), np.asarray(rf_v),
                               atol=5e-5)


@pytest.mark.parametrize('ctile,scal_xla',
                         [(8, True), (16, False), (64, True)])
def test_rf_ctile_and_scalar_hoist_parity(ctile, scal_xla):
    """The chain-tile width (BAYHUNTER_RF_CTILE) and the XLA hoist of
    the per-chain scalars (t0 / free-surface matrices,
    BAYHUNTER_RF_SCAL_XLA) are pure perf knobs: any combination must
    reproduce the vmapped reference RF path on a multi-depth batch.
    (16, hoist on) is the production default; (8, off) the round-2
    configuration; (64) exercises multi-vreg tiles."""
    import jax
    from bayhunter_tpu.ops.rf import synrf, synrf_batch
    rs = np.random.RandomState(5)
    NL, C = 12, 64
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 4) if i < C // 2 else rs.randint(8, NL + 1)
        H[i, :nlay - 1] = rs.uniform(2, 12, nlay - 1)
        vv = np.sort(rs.uniform(2.5, 4.5, nlay))
        VS[i] = vv[-1]
        VS[i, :nlay] = vv
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    QP = np.full((C, NL), 500., np.float32)
    QS = np.full((C, NL), 225., np.float32)

    from bayhunter_tpu.ops import pallas_rf
    saved = pallas_rf.C_TILE, pallas_rf.SCAL_XLA
    pallas_rf.C_TILE, pallas_rf.SCAL_XLA = ctile, scal_xla
    try:
        rf_b = synrf_batch(
            jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
            jnp.asarray(RHO), jnp.asarray(QP), jnp.asarray(QS),
            6.4, 1.0, 256, 5.0, 5.0, VS[:, 0],
            np.full(C, 0.25, np.float32), interpret=True)
    finally:
        pallas_rf.C_TILE, pallas_rf.SCAL_XLA = saved
    rf_v = jax.vmap(
        lambda a, b, c, d, n: synrf(
            a, b, c, d, jnp.asarray(QP[0]), jnp.asarray(QS[0]),
            6.4, 1.0, 256, 5.0, 5.0, n, 0.25)[2])(
        jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
        jnp.asarray(RHO), jnp.asarray(VS[:, 0]))
    np.testing.assert_allclose(np.asarray(rf_b), np.asarray(rf_v),
                               atol=5e-5)


@pytest.mark.parametrize('sched', ['4,2,2', '1', '4,2,', ''])
def test_rf_block_schedule_parity(sched, monkeypatch):
    """The BAYHUNTER_RF_BLOCK comma schedule (non-uniform skip-block
    widths in the 'branch' dynamic-skip path) must be a pure perf
    knob: any schedule — including degenerate ('1') and malformed
    ('4,2,' / '') inputs, which fall back gracefully — produces the
    same RFs as the vmapped reference path on a multi-tile batch
    whose tiles have very different depths."""
    import jax
    from bayhunter_tpu.ops.rf import synrf, synrf_batch
    rs = np.random.RandomState(11)
    NL, C = 12, 16
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 4) if i < 8 else rs.randint(8, NL + 1)
        H[i, :nlay - 1] = rs.uniform(2, 12, nlay - 1)
        vv = np.sort(rs.uniform(2.5, 4.5, nlay))
        VS[i] = vv[-1]
        VS[i, :nlay] = vv
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    QP = np.full((C, NL), 500., np.float32)
    QS = np.full((C, NL), 225., np.float32)

    from bayhunter_tpu.ops import pallas_rf
    monkeypatch.setenv('BAYHUNTER_RF_BLOCK', sched)
    saved = pallas_rf.DYNAMIC_NL
    pallas_rf.DYNAMIC_NL = 'branch'
    try:
        rf_b = synrf_batch(
            jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
            jnp.asarray(RHO), jnp.asarray(QP), jnp.asarray(QS),
            6.4, 1.0, 256, 5.0, 5.0, VS[:, 0],
            np.full(C, 0.25, np.float32), interpret=True)
    finally:
        pallas_rf.DYNAMIC_NL = saved
    rf_v = jax.vmap(
        lambda a, b, c, d, n: synrf(
            a, b, c, d, jnp.asarray(QP[0]), jnp.asarray(QS[0]),
            6.4, 1.0, 256, 5.0, 5.0, n, 0.25)[2])(
        jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
        jnp.asarray(RHO), jnp.asarray(VS[:, 0]))
    np.testing.assert_allclose(np.asarray(rf_b), np.asarray(rf_v),
                               atol=5e-5)


def test_eval_full_batch_matches_vmap_interpret():
    """The full batch evaluator (pallas interpret mode) must agree
    with the vmapped per-chain eval on Rayleigh + Love + RF targets."""
    from bayhunter_tpu import Targets
    from bayhunter_tpu.synthobs import SynthObs
    from bayhunter_tpu.sampler.evaluator import build_evaluator

    h = np.array([8., 25., 0.])
    vs = np.array([2.9, 3.6, 4.4])
    swd = SynthObs.return_swddata(h, vs, vpvs=1.73,
                                  x=np.linspace(3, 35, 5))
    rf = SynthObs.return_rfdata(h, vs, vpvs=1.73,
                                x=np.linspace(-5, 15, 31))
    targets = [
        Targets.RayleighDispersionPhase(*map(np.asarray,
                                             swd['rdispph'])),
        Targets.LoveDispersionPhase(*map(np.asarray, swd['ldispph'])),
        Targets.PReceiverFunction(*map(np.asarray, rf['prf'])),
    ]
    joint = Targets.JointTarget(targets=targets)
    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, 10),
              'vpvs': 1.73, 'mohoest': None, 'mantle': None,
              'swdnoise_corr': 0.0, 'swdnoise_sigma': (1e-5, 0.05),
              'rfnoise_corr': 0.92, 'rfnoise_sigma': (1e-5, 0.05)}
    initparams = {'rcond': 1e-5}
    NL = 8
    ev = build_evaluator(joint, priors, initparams, NL,
                         dtype=jnp.float32, use_batch_swd=True,
                         interpret=True)
    assert ev.eval_full_batch is not None

    rs = np.random.RandomState(7)
    C = 2
    VS = np.zeros((C, NL), np.float32)
    Z = np.zeros((C, NL), np.float32)
    N = np.full(C, 3, np.int32)
    for i in range(C):
        VS[i, :3] = np.sort(rs.uniform(2.5, 4.5, 3))
        VS[i, 3:] = VS[i, 2]
        Z[i, :3] = np.sort(rs.uniform(3, 55, 3))
        Z[i, 3:] = 60.0
    VPVS = np.full(C, 1.73, np.float32)
    NOISE = np.tile(np.array([0.0, 0.02, 0.0, 0.02,
                              0.92, 0.01], np.float32), (C, 1))

    args = (jnp.asarray(VS), jnp.asarray(Z), jnp.asarray(N),
            jnp.asarray(VPVS), jnp.asarray(NOISE))
    # cold per-chain eval provides the warm-start cache
    logL_v, mis_v, val_v, cache = jax.jit(jax.vmap(ev.eval_cold))(*args)

    cell = jnp.zeros(C, jnp.int32)
    logL_b, mis_b, val_b, _ = jax.jit(ev.eval_full_batch)(
        *args, cache, cell)
    np.testing.assert_array_equal(np.asarray(val_b), np.asarray(val_v))
    np.testing.assert_allclose(np.asarray(logL_b), np.asarray(logL_v),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(mis_b), np.asarray(mis_v),
                               rtol=5e-4, atol=1e-5)


def test_batch_solver_anchor_warm_and_caps():
    """anchor_warm recentering must agree with the plain warm search
    for well-behaved perturbations; warm_trips_cap must flag lanes
    whose root lies beyond the capped walk as unfound (err=True)."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    rs = np.random.RandomState(6)
    NL, C = 9, 4
    per = jnp.asarray(np.linspace(2, 35, 9), jnp.float32)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 5)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    args = [jnp.asarray(x) for x in (H, VP, VS, RHO)]

    cg0, err0, roots = surfdisp_roots_batch(*args, per, interpret=True)
    assert not np.any(np.asarray(err0))

    # anchored warm solve from slightly perturbed roots = plain warm
    rp = roots + 0.008
    w_plain = surfdisp_roots_batch(*args, per, c_prev=rp,
                                   interpret=True)[0]
    w_anchor = surfdisp_roots_batch(*args, per, c_prev=rp,
                                    anchor_warm=True,
                                    interpret=True)[0]
    _assert_roots_close(w_anchor, w_plain)

    # a chain whose c_prev is displaced far beyond the capped walk
    # must come back err=True (sentinel-reject semantics), while
    # the uncapped search still finds it
    rp_far = np.asarray(roots) + 0.0117  # off-grid baseline
    rp_far[0] += 1.5
    rp_far = jnp.asarray(rp_far)
    cg_cap, err_cap, _ = surfdisp_roots_batch(
        *args, per, c_prev=rp_far, warm_trips_cap=2, interpret=True)
    assert bool(np.asarray(err_cap)[0])
    assert not np.any(np.asarray(err_cap)[1:])
    cg_unc, err_unc, _ = surfdisp_roots_batch(
        *args, per, c_prev=rp_far, interpret=True)
    # (the displaced chain itself may lock a higher mode when searched
    # uncapped from 1.5 km/s above — nearest-sign-change semantics —
    # so only the undisplaced chains are compared)
    assert not np.any(np.asarray(err_unc)[1:])
    _assert_roots_close(np.asarray(cg_unc)[1:],
                        np.asarray(cg0)[1:])


def test_eval_full_batch_grouped_swd_matches_ungrouped(monkeypatch):
    """Same-wave-type SWD targets fused into shared solver calls must
    produce the same likelihoods/misfits/validity as per-target solves
    (all four SWD types: rayleigh/love x phase/group)."""
    from bayhunter_tpu import Targets
    from bayhunter_tpu.synthobs import SynthObs
    from bayhunter_tpu.sampler.evaluator import build_evaluator

    h = np.array([8., 25., 0.])
    vs = np.array([2.9, 3.6, 4.4])
    swd = SynthObs.return_swddata(h, vs, vpvs=1.73,
                                  x=np.linspace(3, 35, 5))
    targets = [
        Targets.RayleighDispersionPhase(*map(np.asarray,
                                             swd['rdispph'])),
        Targets.RayleighDispersionGroup(*map(np.asarray,
                                             swd['rdispgr'])),
        Targets.LoveDispersionPhase(*map(np.asarray, swd['ldispph'])),
        Targets.LoveDispersionGroup(*map(np.asarray, swd['ldispgr'])),
    ]
    joint = Targets.JointTarget(targets=targets)
    priors = {'vs': (2.0, 5.0), 'z': (0.0, 60.0), 'layers': (1, 10),
              'vpvs': 1.73, 'mohoest': None, 'mantle': None,
              'swdnoise_corr': 0.0, 'swdnoise_sigma': (1e-5, 0.05),
              'rfnoise_corr': 0.92, 'rfnoise_sigma': (1e-5, 0.05)}
    initparams = {'rcond': 1e-5}
    NL = 8

    rs = np.random.RandomState(9)
    C = 3
    VS = np.zeros((C, NL), np.float32)
    Z = np.zeros((C, NL), np.float32)
    N = np.full(C, 3, np.int32)
    for i in range(C):
        VS[i, :3] = np.sort(rs.uniform(2.5, 4.5, 3))
        VS[i, 3:] = VS[i, 2]
        Z[i, :3] = np.sort(rs.uniform(3, 55, 3))
        Z[i, 3:] = 60.0
    VPVS = np.full(C, 1.73, np.float32)
    NOISE = np.tile(np.array([0.0, 0.02, 0.0, 0.02,
                              0.0, 0.02, 0.0, 0.02], np.float32),
                    (C, 1))
    args = (jnp.asarray(VS), jnp.asarray(Z), jnp.asarray(N),
            jnp.asarray(VPVS), jnp.asarray(NOISE))
    cell = jnp.zeros(C, jnp.int32)

    def run(group):
        monkeypatch.setenv('BAYHUNTER_GROUP_SWD',
                           '1' if group else '0')
        ev = build_evaluator(joint, priors, initparams, NL,
                             dtype=jnp.float32, use_batch_swd=True,
                             interpret=True)
        _, _, _, cache = jax.jit(jax.vmap(ev.eval_cold))(*args)
        out = ev.eval_full_batch(*args, cache, cell)
        out_dim = ev.eval_full_batch(*args, cache, cell,
                                     ring_width=24, dim_move=True)
        return out, out_dim

    (l1, m1, v1, c1), (ld1, md1, vd1, _) = run(group=True)
    (l0, m0, v0, c0), (ld0, md0, vd0, _) = run(group=False)

    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v0))
    np.testing.assert_array_equal(np.asarray(vd1), np.asarray(vd0))
    # grouped refinement runs >= passes of ungrouped (group members
    # lift phase members to 3), so roots agree to the f32 secant
    # tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(ld1), np.asarray(ld0),
                               rtol=5e-4)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=5e-4, atol=1e-5)
    for (ya, ra, sa), (yb, rb, sb) in zip(c1, c0):
        assert ya.shape == yb.shape and ra.shape == rb.shape
        assert sa.shape == ra.shape and sb.shape == rb.shape
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                                   atol=5e-4)


def test_batch_solver_newton_prepass(monkeypatch):
    """BAYHUNTER_DIM_PREPASS=newton: the one-call Newton recentering
    must agree with the anchor-ring recentering for well-behaved
    perturbations (same warm-search semantics afterwards)."""
    import os
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    rs = np.random.RandomState(16)
    NL, C = 9, 6
    per = jnp.asarray(np.linspace(2, 35, 9), jnp.float32)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 5)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    args = [jnp.asarray(x) for x in (H, VP, VS, RHO)]

    _, err0, roots = surfdisp_roots_batch(*args, per, interpret=True)
    assert not np.any(np.asarray(err0))

    rp = roots + 0.011   # off-grid displacement, ~2 DDC steps
    w_anchor = surfdisp_roots_batch(*args, per, c_prev=rp,
                                    anchor_warm=True,
                                    interpret=True)[0]
    monkeypatch.setenv('BAYHUNTER_DIM_PREPASS', 'newton')
    w_newton, err_n, _ = surfdisp_roots_batch(
        *args, per, c_prev=rp, anchor_warm=True, interpret=True)
    assert not np.any(np.asarray(err_n))
    _assert_roots_close(w_newton, w_anchor)


def test_pert_newton_matches_wide_ring(monkeypatch):
    """pert_newton=True + a narrow walk bound (the sampler's vs/vpvs
    configuration) must find the same roots as the default wide-ring
    warm solve on realistic perturbation-move inputs: the Newton
    recentering puts reachable lanes back on their roots, so the
    narrow bound only changes which hopeless lanes cap-reject."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    rs = np.random.RandomState(41)
    C, NL = 12, 13
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        n = rs.randint(3, 7)
        z = np.sort(rs.uniform(2, 55, n))
        v = np.sort(rs.uniform(2.4, 4.5, n))
        H[i, :n - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :n] = v
    per = jnp.asarray(np.linspace(2.0, 35.0, 9), jnp.float32)

    def layered(vs):
        vp = vs * 1.73
        return tuple(jnp.asarray(x) for x in
                     (H, vp, vs, vp * 0.32 + 0.77))

    _, err0, roots = surfdisp_roots_batch(*layered(VS), per,
                                          interpret=True)
    assert not np.any(np.asarray(err0))

    # vs-move-sized perturbation, off the DDC/16 refinement grid
    VS_p = (VS + rs.uniform(-0.025, 0.025, VS.shape)
            .astype(np.float32))
    args_p = layered(VS_p)
    cg_wide, err_w, _ = surfdisp_roots_batch(
        *args_p, per, c_prev=roots, warm_halfwidth=16,
        interpret=True)
    cg_nwt, err_n, _ = surfdisp_roots_batch(
        *args_p, per, c_prev=roots, warm_halfwidth=4,
        pert_newton=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(err_n),
                                  np.asarray(err_w))
    _assert_roots_close(cg_nwt, cg_wide)


@pytest.mark.parametrize('iwave,igr', [(2, 0), (2, 1), (1, 0)])
def test_walker_matches_staged_warm_solve(iwave, igr, monkeypatch):
    """The fused walking warm solver (BAYHUNTER_WARM_SOLVER=walk,
    ops/pallas_walk.py) must reproduce the staged ring + k-section
    pipeline on realistic warm solves: identical found flags and
    roots within the dual-threshold refinement tolerance."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch

    rs = np.random.RandomState(23)
    C, NL = 16, 21
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        n = rs.randint(3, 9)
        z = np.sort(rs.uniform(2, 55, n))
        v = np.sort(rs.uniform(2.4, 4.5, n))
        H[i, :n - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :n] = v
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77
    args = tuple(jnp.asarray(x) for x in (H, VP, VS, RHO))
    periods = jnp.asarray(np.linspace(2.0, 35.0, 9), jnp.float32)

    monkeypatch.delenv('BAYHUNTER_WARM_SOLVER', raising=False)
    cg0, err0, roots0 = surfdisp_roots_batch(
        *args, periods, None, iwave=iwave, igr=igr, interpret=True)
    assert not np.asarray(err0).all()

    # small perturbation: the warm regime the walker is built for.
    # Fresh seed chosen OFF the refinement grid (round-1 guidance):
    # displacements that park roots near dc/16^k cell boundaries make
    # the two individually-accurate paths land one sub-cell apart,
    # which the containment assert below covers instead.
    rs = np.random.RandomState(99)
    VS_p = VS + rs.uniform(-0.02, 0.02, VS.shape).astype(np.float32)
    # uniform f32 like production: mixed f32/f64 layer arrays (x64
    # promotion of VS_p * 1.73) make the two paths upcast at
    # different points and land one refinement sub-cell apart
    args_p = tuple(jnp.asarray(np.asarray(x, np.float32)) for x in
                   (H, VS_p * 1.73, VS_p,
                    VS_p * 1.73 * 0.32 + 0.77))

    kw = dict(iwave=iwave, igr=igr, warm_trips_cap=2, interpret=True)
    monkeypatch.setenv('BAYHUNTER_WARM_SOLVER', 'staged')
    cg_s, err_s, roots_s = surfdisp_roots_batch(
        *args_p, periods, roots0, **kw)
    monkeypatch.setenv('BAYHUNTER_WARM_SOLVER', 'walk')
    cg_w, err_w, roots_w = surfdisp_roots_batch(
        *args_p, periods, roots0, **kw)

    np.testing.assert_array_equal(np.asarray(err_s),
                                  np.asarray(err_w))
    ok = ~np.asarray(err_s)
    assert ok.sum() >= C // 2
    from bayhunter_tpu.ops.swd import DDC
    d = np.abs(np.asarray(roots_s) - np.asarray(roots_w))[ok]
    assert d.max() < DDC  # same bracket cell always
    _assert_roots_close(np.asarray(roots_s)[ok],
                        np.asarray(roots_w)[ok])
    # group velocities difference two phase solves 1% apart, which
    # amplifies sub-cell root differences ~100x (measured cg p90
    # 4.5e-5 from root p90 4.8e-7) — still 60x below posterior noise
    _assert_roots_close(np.asarray(cg_s)[ok], np.asarray(cg_w)[ok],
                        p90=1e-4 if igr else 2e-5,
                        amax=2e-3 if igr else 5e-4)


def test_walker_in_kernel_newton_matches_xla_prepass(monkeypatch):
    """BAYHUNTER_WALK_NEWTON (default on): the walker's in-kernel
    Newton recentering must agree with the XLA-level prepass (same
    math, same clip; the in-kernel form only avoids two dispatched
    secular calls whose live lanes pad 42 -> 128)."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    rs = np.random.RandomState(23)
    NL, C = 9, 6
    per = jnp.asarray(np.linspace(2, 35, 9), jnp.float32)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 5)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    args = [jnp.asarray(x) for x in
            (H, VS * 1.73, VS, VS * 1.73 * 0.32 + 0.77)]

    _, err0, roots = surfdisp_roots_batch(*args, per, interpret=True)
    assert not np.any(np.asarray(err0))
    rp = roots + 0.023   # ~4.6 DDC, off-grid

    kw = dict(c_prev=rp, anchor_warm=True, warm_trips_cap=2,
              interpret=True)
    monkeypatch.setenv('BAYHUNTER_WALK_NEWTON', '0')
    w_xla, err_x, _ = surfdisp_roots_batch(*args, per, **kw)
    monkeypatch.setenv('BAYHUNTER_WALK_NEWTON', '1')
    w_ker, err_k, _ = surfdisp_roots_batch(*args, per, **kw)
    np.testing.assert_array_equal(np.asarray(err_x),
                                  np.asarray(err_k))
    assert not np.any(np.asarray(err_k))
    _assert_roots_close(w_ker, w_xla)


def test_converged_warm_start_returns_root():
    """A warm start sitting exactly ON the root (what the iterated
    Newton prepass produces) must come back unmoved — the closing
    secant's out-of-bracket fallback must return the zero-value
    endpoint, not the bracket midpoint (a DDC/32 systematic shift,
    regression: session-6 parity failure)."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    rs = np.random.RandomState(31)
    NL, C = 9, 6
    per = jnp.asarray(np.linspace(2, 35, 9), jnp.float32)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 5)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    args = [jnp.asarray(x) for x in
            (H, VS * 1.73, VS, VS * 1.73 * 0.32 + 0.77)]

    cg0, err0, roots = surfdisp_roots_batch(*args, per,
                                            interpret=True)
    assert not np.any(np.asarray(err0))
    # dim-move (newton prepass) warm solve FROM the exact roots
    cg_w, err_w, _ = surfdisp_roots_batch(
        *args, per, c_prev=roots, anchor_warm=True, warm_trips_cap=2,
        interpret=True)
    assert not np.any(np.asarray(err_w))
    d = np.abs(np.asarray(cg_w) - np.asarray(cg0))
    assert np.percentile(d, 90) < 2e-6, np.percentile(d, 90)
    assert d.max() < 5e-5, d.max()


def test_walker_compact_props_bitwise_parity():
    """BAYHUNTER_WALK_COMPACT ships the walker's layer properties as
    per-chain (T, NL, 8, M) columns expanded in-kernel to lane groups
    (VMEM scratch) instead of XLA-side lane-broadcast blocks.  Same
    evaluations in the same order -> results must be BITWISE equal to
    the dense path, Love and Rayleigh, including a pure-halfspace
    (n=1, top == -1) batch whose layer 0 is read unconditionally by
    the water-surface clause."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    rs = np.random.RandomState(3)
    NL = 10
    per = jnp.asarray(np.linspace(2.0, 35.0, 11), jnp.float32)

    def batch(C, with_halfspace_only):
        H = np.zeros((C, NL), np.float32)
        VS = np.zeros((C, NL), np.float32)
        for c in range(C):
            if with_halfspace_only and c == 0:
                vs = np.array([3.5]); h = np.array([0.0])
            else:
                n = rs.randint(2, 7)
                vs = np.sort(rs.uniform(2.3, 4.5, n))
                h = rs.uniform(3.0, 14.0, n)
                h[-1] = 0.0
            H[c, :h.size] = h
            VS[c] = vs[-1]
            VS[c, :vs.size] = vs
        VP = VS * 1.73
        return tuple(jnp.asarray(x)
                     for x in (H, VP, VS, VP * 0.32 + 0.77))

    for iwave, hs in ((2, False), (2, True), (1, False)):
        args = batch(8, hs)
        _, _, roots = surfdisp_roots_batch(*args, per, iwave=iwave,
                                           interpret=True)
        cp = roots + 0.0013
        kw = dict(c_prev=cp, iwave=iwave, warm_halfwidth=2,
                  warm_trips_cap=2, pert_newton=True, interpret=True)
        os.environ['BAYHUNTER_WALK_COMPACT'] = '0'
        cg0, e0, r0 = surfdisp_roots_batch(*args, per, **kw)
        os.environ['BAYHUNTER_WALK_COMPACT'] = '1'
        try:
            cg1, e1, r1 = surfdisp_roots_batch(*args, per, **kw)
        finally:
            del os.environ['BAYHUNTER_WALK_COMPACT']
        np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
        np.testing.assert_array_equal(
            np.asarray(r0), np.asarray(r1),
            err_msg='iwave=%d halfspace-only=%s' % (iwave, hs))


def test_cached_slope_newton_matches_fd():
    """BAYHUNTER_SLOPE_CACHE: the perturbation-move Newton
    recentering seeded by the cached bracket slope (one secular
    sweep) must land on the same roots as the finite-difference
    first iteration (two sweeps) — both are recentering heuristics
    feeding the same walk + bisection + secant guarantee, so roots
    agree to refinement accuracy.  Also pins that every found lane
    of a solve returns a nonzero cacheable slope."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch
    rs = np.random.RandomState(41)
    NL, C = 10, 8
    per = jnp.asarray(np.linspace(2, 35, 9), jnp.float32)
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 6)
        z = np.sort(rs.uniform(2, 50, nlay))
        v = np.sort(rs.uniform(2.3, 4.5, nlay))
        H[i, :nlay - 1] = np.diff(np.concatenate(
            [[0], 0.5 * (z[:-1] + z[1:])]))
        VS[i] = v[-1]
        VS[i, :nlay] = v
    args = [jnp.asarray(x) for x in
            (H, VS * 1.73, VS, VS * 1.73 * 0.32 + 0.77)]

    _, err0, roots, slopes = surfdisp_roots_batch(
        *args, per, return_slopes=True, interpret=True)
    assert not np.any(np.asarray(err0))
    assert np.all(np.abs(np.asarray(slopes)) > 0)

    # vs-move-sized perturbation of every chain
    VS2 = VS + rs.normal(0, 0.015, VS.shape).astype(np.float32)
    args2 = [jnp.asarray(x) for x in
             (H, VS2 * 1.73, VS2, VS2 * 1.73 * 0.32 + 0.77)]
    kw = dict(c_prev=roots, warm_halfwidth=2, warm_trips_cap=2,
              pert_newton=True, return_slopes=True, interpret=True)
    w_fd, e_fd, _, s_fd = surfdisp_roots_batch(*args2, per, **kw)
    w_sl, e_sl, _, s_sl = surfdisp_roots_batch(
        *args2, per, slope_prev=slopes, **kw)
    np.testing.assert_array_equal(np.asarray(e_fd), np.asarray(e_sl))
    assert not np.any(np.asarray(e_sl))
    _assert_roots_close(w_sl, w_fd)
    assert np.all(np.abs(np.asarray(s_sl)) > 0)

    # the 0.0 no-cache sentinel must disable recentering, not fling
    # the start by maxshift: an all-zero-slope solve must behave
    # exactly like a no-prepass solve (same finds, same roots).
    # Pin the refinement depth: the default keys on the pert_newton
    # FLAG (recentered -> 0, unrecentered -> 1), which would compare
    # different refiners here.
    os.environ['BAYHUNTER_WALK_NBISECT'] = '1'
    try:
        w_z, e_z, r_z, _ = surfdisp_roots_batch(
            *args2, per, slope_prev=jnp.zeros_like(slopes), **kw)
        kw_np = dict(kw, pert_newton=False)
        w_n, e_n, r_n, _ = surfdisp_roots_batch(*args2, per,
                                                **kw_np)
    finally:
        del os.environ['BAYHUNTER_WALK_NBISECT']
    np.testing.assert_array_equal(np.asarray(e_z), np.asarray(e_n))
    np.testing.assert_array_equal(np.asarray(r_z), np.asarray(r_n))


def test_rf_uniform_q_phase_hoist_parity():
    """Scalar (uniform) qp/qs enable the RF kernel's shared
    phase-factor specialization (ops/pallas_rf.py q_const): 1/u(w)^2
    is computed once per program instead of a per-layer complex
    velocity build + square + inversion.  Algebraically identical to
    the array-Q path; per-layer f32 rounding differences amplify
    through the recursion + spectral deconvolution to a few 1e-6 on
    an O(0.1) RF (vs the 5e-5 pallas-vs-XLA parity bound and the
    >=1e-3 posterior sigma_RF scale)."""
    from bayhunter_tpu.ops.rf import synrf_batch
    rs = np.random.RandomState(9)
    NL, C = 8, 4
    H = np.zeros((C, NL), np.float32)
    VS = np.zeros((C, NL), np.float32)
    for i in range(C):
        nlay = rs.randint(2, 6)
        H[i, :nlay - 1] = rs.uniform(3, 20, nlay - 1)
        vv = np.sort(rs.uniform(2.5, 4.5, nlay))
        VS[i] = vv[-1]
        VS[i, :nlay] = vv
    VP = VS * 1.73
    RHO = VP * 0.32 + 0.77

    for wave in (0, 1):
        args = (jnp.asarray(H), jnp.asarray(VP), jnp.asarray(VS),
                jnp.asarray(RHO))
        tail = (6.4, 1.0, 256, 5.0, 5.0, VS[:, 0],
                np.full(C, 0.25, np.float32))
        rf_s = synrf_batch(*args, 500.0, 225.0, *tail,
                           wave_type=wave, interpret=True)
        rf_a = synrf_batch(
            *args, jnp.full((C, NL), 500.0, jnp.float32),
            jnp.full((C, NL), 225.0, jnp.float32), *tail,
            wave_type=wave, interpret=True)
        np.testing.assert_allclose(np.asarray(rf_s),
                                   np.asarray(rf_a), atol=1e-5)
