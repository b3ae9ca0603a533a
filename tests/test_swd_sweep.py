"""Randomized dispersion stress sweep against the independent native
C++ golden: the reference's hardest failure modes live in the root
search (mode jumps near osculating modes, LVZ reverse dispersion,
getsol misses — reference: extensions/surfdisp96.f:313-327,429-447),
so the JAX solver and the native transcription must agree on BOTH the
error flag and the located root for hundreds of pathological models —
a silent mode-jump in either implementation shows up as a gross value
mismatch with no error flag.

Calibration (scripts/calibrate_sweep.py, 1000 cases): zero flag
mismatches, zero value disagreements > 5e-4; f32 secant-polish error
vs f64 (ADVICE.md round 1): median 1.7e-7, p99 1.2e-6, max 1.6e-4 —
all inside the dc/16 bracket-width worst case (~3.1e-4).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bayhunter_tpu.ops.swd import surfdisp

native = pytest.importorskip('bayhunter_tpu.native')
if native.load() is None:  # pragma: no cover
    pytest.skip('native library unavailable', allow_module_level=True)

NL = 10
PERIODS = np.linspace(2.0, 35.0, 11)        # fundamental-mode band
PERIODS_HI = np.linspace(0.6, 4.0, 9)       # higher modes need short T
KINDS = ('plain', 'lvz', 'hvz', 'thin', 'vpvs')
N_PER_KIND = 20


def _pad(arr, hs):
    out = np.full(NL, hs)
    out[:arr.size] = arr
    return out


def make_model(rs, kind):
    """Random layered model of a pathology class: low-velocity zone,
    high-velocity zone (reverse dispersion territory), thin layers,
    high vp/vs — the regimes where root searches mode-jump."""
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


def _jax_case(h, vp, vs, rho, periods, iwave, mode, igr, dtype):
    cg, err = surfdisp(jnp.asarray(_pad(h, 0.0), dtype),
                       jnp.asarray(_pad(vp, vp[-1]), dtype),
                       jnp.asarray(_pad(vs, vs[-1]), dtype),
                       jnp.asarray(_pad(rho, rho[-1]), dtype),
                       jnp.asarray(periods, dtype),
                       iwave=iwave, mode=mode, igr=igr)
    return np.asarray(cg), bool(err)


def _sweep(combos, periods, min_found):
    rs = np.random.RandomState(42)
    n_found = 0
    for kind in KINDS:
        for i in range(N_PER_KIND):
            h, vp, vs, rho = make_model(rs, kind)
            for iwave, mode, igr in combos:
                cg_n, err_n = native.surfdisp_native(
                    h, vp, vs, rho, periods, iwave=iwave, mode=mode,
                    igr=igr)
                cg_j, err_j = _jax_case(h, vp, vs, rho, periods,
                                        iwave, mode, igr, jnp.float64)
                case = '%s[%d] iwave=%d mode=%d igr=%d' \
                    % (kind, i, iwave, mode, igr)
                assert err_j == err_n, 'flag mismatch: ' + case
                if not err_n:
                    n_found += 1
                    d = np.max(np.abs(cg_j - cg_n))
                    assert d < 5e-4, \
                        'root mismatch %.2e (mode jump?): %s' % (d,
                                                                 case)
    # the sweep must exercise real solves, not just consistent errs
    assert n_found >= min_found, n_found


def test_sweep_fundamental_modes():
    """500 cases: Rayleigh/Love phase + Rayleigh group, fundamental
    mode, across all five pathology classes."""
    _sweep([(2, 1, 0), (1, 1, 0), (2, 1, 1), (1, 1, 1),
            (2, 1, 0)], PERIODS, min_found=350)


def test_sweep_higher_modes():
    """Modes 2-3 at short periods (above their cutoff): found roots
    must agree with the native golden; cutoffs must flag identically
    (no silent fundamental-mode fallback)."""
    _sweep([(2, 2, 0), (1, 2, 0), (2, 3, 0)], PERIODS_HI,
           min_found=50)


def test_f32_refinement_error_bounded():
    """Regression bound on the f32 solver's root accuracy (ADVICE.md
    round 1): the default single sign pass + secant polish must stay
    well inside the dc/16 bracket width against the f64 native golden
    — in distribution, not just on parity fixtures."""
    rs = np.random.RandomState(7)
    errs = []
    for kind in KINDS:
        for _ in range(12):
            h, vp, vs, rho = make_model(rs, kind)
            cg_n, err_n = native.surfdisp_native(h, vp, vs, rho,
                                                 PERIODS, iwave=2)
            if err_n:
                continue
            cg32, err32 = _jax_case(h, vp, vs, rho, PERIODS, 2, 1, 0,
                                    jnp.float32)
            assert not err32
            errs.append(np.abs(cg32 - cg_n))
    e = np.concatenate(errs)
    assert e.size >= 400
    # calibrated: median 1.7e-7 p99 1.2e-6 max 1.6e-4 (2200 lanes)
    assert np.median(e) < 2e-6
    assert np.percentile(e, 99) < 2e-5
    assert e.max() < 3.3e-4  # dc/16 bracket width is the hard ceiling


def test_grouped_solver_pathology_sweep():
    """Grouped vs per-target batch solves across randomized
    pathological model batches (LVZ/HVZ/thin/high-vpvs): the shared
    bracketing/refinement pipeline must reproduce each target's
    per-target solution — roots within the refinement tolerance, error
    flags identical — cold AND warm.

    Runs in a fresh interpreter: XLA:CPU intermittently segfaults on
    this workload late in a long suite process (see
    conftest.run_isolated)."""
    from tests.conftest import run_isolated
    if run_isolated('tests/test_swd_sweep.py::'
                    'test_grouped_solver_pathology_sweep'):
        return
    from bayhunter_tpu.ops.swd import (surfdisp_roots_batch,
                                       surfdisp_roots_batch_grouped)

    rs = np.random.RandomState(7)
    C = 8
    p_ph = jnp.asarray(np.linspace(2.0, 35.0, 9), jnp.float32)
    p_gr = jnp.asarray(np.linspace(3.0, 30.0, 7), jnp.float32)

    for trial, kind in enumerate(KINDS):
        H = np.zeros((C, NL), np.float32)
        VP = np.zeros((C, NL), np.float32)
        VS = np.zeros((C, NL), np.float32)
        RHO = np.zeros((C, NL), np.float32)
        for c in range(C):
            h, vp, vs, rho = make_model(rs, kind)
            H[c] = _pad(h, 0.0)
            VP[c] = _pad(vp, vp[-1])
            VS[c] = _pad(vs, vs[-1])
            RHO[c] = _pad(rho, rho[-1])
        args = tuple(jnp.asarray(x) for x in (H, VP, VS, RHO))

        # cold: grouped vs separate
        outs = surfdisp_roots_batch_grouped(
            *args, [p_ph, p_gr], [0, 1], None, iwave=2,
            interpret=True)
        ref_ph = surfdisp_roots_batch(*args, p_ph, None, iwave=2,
                                      igr=0, interpret=True)
        ref_gr = surfdisp_roots_batch(*args, p_gr, None, iwave=2,
                                      igr=1, interpret=True)
        for (g, r), name in zip(zip(outs, (ref_ph, ref_gr)),
                                ('phase', 'group')):
            np.testing.assert_array_equal(
                np.asarray(g[1]), np.asarray(r[1]),
                err_msg='%s err flags, %s' % (name, kind))
            ok = ~np.asarray(g[1])
            np.testing.assert_allclose(
                np.asarray(g[0])[ok], np.asarray(r[0])[ok],
                atol=5e-4, err_msg='%s roots, %s' % (name, kind))

        # warm: displaced off the DDC grid from the cold roots
        cps = [outs[0][2] + 0.0117, outs[1][2] + 0.0117]
        w_out = surfdisp_roots_batch_grouped(
            *args, [p_ph, p_gr], [0, 1], cps, iwave=2,
            interpret=True)
        w_ph = surfdisp_roots_batch(*args, p_ph, cps[0], iwave=2,
                                    igr=0, interpret=True)
        w_gr = surfdisp_roots_batch(*args, p_gr, cps[1], iwave=2,
                                    igr=1, interpret=True)
        for (g, r), name in zip(zip(w_out, (w_ph, w_gr)),
                                ('phase', 'group')):
            np.testing.assert_array_equal(
                np.asarray(g[1]), np.asarray(r[1]),
                err_msg='warm %s err flags, %s' % (name, kind))
            ok = ~np.asarray(g[1])
            np.testing.assert_allclose(
                np.asarray(g[0])[ok], np.asarray(r[0])[ok],
                atol=5e-4, err_msg='warm %s roots, %s' % (name, kind))


def test_walker_warm_refinement_error_bounded():
    """Regression bound on the WALKING warm solver's root accuracy at
    the production bracket-refinement depth (BAYHUNTER_WALK_NBISECT
    default 0 for phase solves — the closing secant interpolates the
    raw DDC walk bracket): randomized vs-move-sized perturbations of
    pathology models, warm-solved from the unshifted roots, against
    the f64 native golden of the perturbed model.

    Calibration (scripts/calibrate_walk_nbisect.py NB_DEPTHS=2,1,0,
    2145 lanes): depth 2/1/0 median 1.79/1.84/1.90e-7,
    p99 1.4/1.8/3.7e-6 — the closing secant polish on the bracket
    values dominates; the max (~6e-2) is a rare warm-vs-cold
    root-selection difference near osculating modes, not a refinement
    error, so it is bounded as a count, not a magnitude."""
    from bayhunter_tpu.ops.swd import surfdisp_roots_batch

    rs = np.random.RandomState(17)
    per = jnp.asarray(PERIODS, jnp.float32)
    errs = []
    n_outlier = 0
    for kind in KINDS:
        rows0, rows2, golds = [], [], []
        while len(rows0) < 6:
            h, vp, vs, rho = make_model(rs, kind)
            vs2 = vs.copy()
            i = rs.randint(0, vs.size)
            vs2[i] = np.clip(vs2[i] + rs.normal(0, 0.015), 2.0, 5.0)
            vp2 = vs2 * (vp[0] / vs[0])
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
            np.stack([r[j] for r in rows]).astype(np.float32))
        args0 = tuple(B(rows0, j) for j in range(4))
        args2 = tuple(B(rows2, j) for j in range(4))
        gold = np.stack(golds)
        _, _, roots = surfdisp_roots_batch(*args0, per,
                                           interpret=True)
        cg, err, _ = surfdisp_roots_batch(
            *args2, per, c_prev=roots, warm_halfwidth=2,
            warm_trips_cap=2, pert_newton=True, interpret=True)
        cgv = np.asarray(cg)
        found = np.isfinite(cgv) & (cgv > 0)
        e = np.abs(cgv[found] - gold[found])
        n_outlier += int((e > 1.5e-3).sum())
        errs.append(e[e <= 1.5e-3])
    e = np.concatenate(errs)
    assert e.size >= 250
    # calibrated: median 1.8e-7, p99 1.5e-6 (depth-invariant 4..1)
    assert np.median(e) < 2e-6
    assert np.percentile(e, 99) < 2e-5
    # root-selection outliers (warm lock onto a neighbouring mode):
    # rare, depth-independent, bounded as a fraction of lanes
    assert n_outlier <= 0.01 * (e.size + n_outlier)
