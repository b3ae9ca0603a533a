"""Batched joint-target evaluator for the on-device sampler.

Builds, from a host-side ``JointTarget``, a pure function
``eval_fn(vs, z, n, vpvs, noise) -> (logL, misfits, valid)`` evaluating
one (masked, fixed-shape) Voronoi model against every target — the
device equivalent of ``JointTarget.evaluate``
(reference: src/Targets.py:314-347), including the sentinel semantics
(logL=-1e15, misfits=1e15 on any invalid forward output).

The covariance law per target is fixed at build time following the
reference's dispatch (reference: src/SingleChain.py:159-205):
  * corr inverted for            -> exponential law (matrix-free)
  * corr fixed to 0, NaN yerr    -> diagonal
  * corr fixed to 0, real yerr   -> diagonal with scaled errors
  * corr fixed nonzero, RF       -> Gaussian law (dense inverse
                                    precomputed ONCE on the host with
                                    optional rcond pinv)
  * corr fixed nonzero, otherwise-> exponential law
"""

import logging
import os
import typing

import numpy as np
import jax
import jax.numpy as jnp

from bayhunter_tpu.ops import likelihood as lk
from bayhunter_tpu.ops.rf import synrf, P_WAVE, SV_WAVE
from bayhunter_tpu.ops.swd import surfdisp_roots
from bayhunter_tpu.ops.voronoi import (voronoi_to_layers,
                                       voronoi_to_layers_batch)

logger = logging.getLogger(__name__)


class EvalBundle(typing.NamedTuple):
    """Joint-target evaluators sharing a forward cache.

    The cache (one per chain) is a tuple over targets of
    ``(y_synth, roots, slopes)`` — the synthetic data of the
    *current* model and, for SWD targets, the dispersion roots used
    to warm-start the next solve and their bracket's secular slopes
    (seeding the next perturbation solve's Newton recentering with
    one sweep instead of two; 0.0 = no-cache sentinel).
    ``roots``/``slopes`` are zero-length arrays for RF targets.

      eval_full(vs, z, n, vpvs, noise, cache)
          -> (logL, misfits, valid, new_cache)   # warm-started
      eval_cold(vs, z, n, vpvs, noise)
          -> (logL, misfits, valid, new_cache)   # full root search
      eval_noise(noise, cache) -> (logL, valid)  # reuses cached y;
          misfits are unchanged by noise moves by construction
    """
    eval_full: typing.Callable
    eval_cold: typing.Callable
    eval_noise: typing.Callable
    ntargets: int
    specs: list
    # batch-first variant (chains as a native leading axis) — present
    # when the SWD solve can use the pallas kernel (f32, TPU devices);
    # signature mirrors eval_full with (C, ...) arrays
    eval_full_batch: typing.Callable = None
    # transposed-layout variant: model arrays arrive (NL, C) with
    # chains on the 128-wide lane axis (the chains-on-lanes step
    # pipeline, ops/voronoi.py T variants) — every model-vector op
    # and solver operand pack runs full-lane without barrier fences.
    # Present when every configured target supports the T fast path
    eval_full_batch_t: typing.Callable = None
    # mk_ok(dim_move) -> bool: whether the unified model kernel
    # (ops/pallas_prep.model_operands_t) can serve every target of
    # this configuration — the sampler checks it before passing
    # mk_cfg into eval_full_batch_t
    mk_ok: typing.Callable = None

    # old 3-output protocol (cold start), for convenience in tests
    def __call__(self, vs, z, n, vpvs, noise):
        logL, misfits, valid, _ = self.eval_cold(vs, z, n, vpvs, noise)
        return logL, misfits, valid

SWD_REFS = {'rdispph': (2, 0), 'ldispph': (1, 0),
            'rdispgr': (2, 1), 'ldispgr': (1, 1)}
RF_REFS = {'prf': P_WAVE, 'srf': SV_WAVE}

LOGL_SENTINEL = -1e15
MISFIT_SENTINEL = 1e15

# A/B toggle for the pallas RF transmission kernel in the batch path
# (set BAYHUNTER_PALLAS_RF=0 to fall back to the vmapped XLA synrf)
_USE_PALLAS_RF = os.environ.get('BAYHUNTER_PALLAS_RF', '1') == '1'

# cached-slope Newton seeding for perturbation-move warm solves
# (BAYHUNTER_SLOPE_CACHE=0 restores the FD first iteration, for A/B):
# the previous solve's closing-bracket slope rides the forward cache,
# so the vs/vpvs recentering costs ONE secular sweep instead of two.
_SLOPE_CACHE = os.environ.get('BAYHUNTER_SLOPE_CACHE', '1') == '1'
# NOTE a DIMENSION-move slope cache (cached slopes + renormalization
# exponents rescaling them across the ±1-layer jump) was built in
# round 4 and adjudicated OFF on-chip: the exponent rescale is exact
# (slope ratio cached/FD p50 0.92-1.0 across the jump) but the
# OLD-model slope is too stale for death-like proposals (>2-DDC
# iteration-1 miss class 41% vs 22%; fwd_reject_dim_pct 10.95 ->
# 26.1%).  No per-lane variant can win either: the walker's FD sweep
# is program-wide, so partial cache coverage saves nothing.  The
# whole exponent-tracking infrastructure was deleted in round 5 per
# the dead-knob policy (docs/performance.md); dim moves keep the FD
# value+slope pair.

# warm-ring trip cap for the batch SWD path; 0 disables the cap
_WARM_TRIPS_CAP = int(os.environ.get('BAYHUNTER_WARM_CAP', '2')) or None
# dimension-move override (A/B of width x trips at fixed coverage);
# unset -> same cap as perturbation moves
_DIM_TRIPS_CAP = int(os.environ.get('BAYHUNTER_DIM_CAP', '0')) or None


def _covariance_kind(target, corr_fixed, corr_value):
    """Reference: src/SingleChain.py:159-205."""
    if not corr_fixed:
        return 'exp'
    if corr_value == 0 and np.any(np.isnan(target.obsdata.yerr)):
        return 'nocorr'
    if corr_value == 0:
        return 'nocorr_scalederr'
    if getattr(target, 'noiseref', 'swd') == 'rf':
        return 'gauss'
    return 'exp'


class _TargetSpec:
    """Host-precomputed constants for one target."""

    def __init__(self, target, corr_fixed, corr_value, rcond, dtype,
                 dof_correction=False):
        self.ref = target.ref
        self.kind = 'swd' if target.ref in SWD_REFS else \
            'rf' if target.ref in RF_REFS else 'custom'
        # observed data may be (ndata,) for one station, or
        # (ncells, ndata) for tomography-scale batched inversions —
        # each chain then selects its row via its ``cell`` index
        yobs = np.asarray(target.obsdata.y)
        self.batched_obs = yobs.ndim == 2
        self.yobs = jnp.asarray(yobs, dtype)
        self.ndata = int(yobs.shape[-1])
        self.cov = _covariance_kind(target, corr_fixed, corr_value)

        plugin = target.moddata.plugin
        if self.kind == 'swd':
            self.iwave, self.igr = SWD_REFS[target.ref]
            self.mode = int(plugin.modelparams.get('mode', 1))
            self.flsph = int(plugin.modelparams.get('flsph', 0))
            obsx = np.asarray(target.obsdata.x, float)
            if obsx.size > 60:
                # reference 60-period cap + interpolation
                # (src/surf96_modsw.py:35-43,106-122)
                self.periods = jnp.asarray(
                    np.linspace(obsx.min(), obsx.max(), 60), dtype)
                self.interp_x = jnp.asarray(obsx, dtype)
            else:
                self.periods = jnp.asarray(obsx, dtype)
                self.interp_x = None
        elif self.kind == 'rf':
            self.wave_type = RF_REFS[target.ref]
            self.fsamp = float(plugin.fsamp)
            self.tshift = float(plugin.tshft)
            self.nsamp = int(plugin.nsamp)
            self.gauss_a = float(plugin.modelparams['gauss'])
            self.p = float(plugin.modelparams['p'])
            self.nsv = plugin.modelparams.get('nsv', None)
        else:
            # custom target: the plugin must expose a JAX-traceable
            # forward `run_model_jax(h, vp, vs, rho) -> y` over padded
            # (NL,) layer arrays (see templates/myfwd.py)
            fwd = getattr(plugin, 'run_model_jax', None)
            if fwd is None:
                raise NotImplementedError(
                    'custom target %r: its forward plugin must define '
                    'run_model_jax(h, vp, vs, rho) -> y (a JAX-'
                    'traceable, fixed-shape function; see '
                    'templates/myfwd.py)' % target.ref)
            self.jax_forward = fwd

        if self.cov == 'gauss':
            self.dof_correction = bool(dof_correction)
            whitener, logdet = lk.gauss_whitener(
                corr_value, self.ndata, rcond=rcond,
                return_kept=self.dof_correction)
            self.whitener = jnp.asarray(whitener, dtype)
            self.logcorr_det = float(logdet)
        elif self.cov == 'nocorr_scalederr':
            yerr = np.asarray(target.obsdata.yerr, float)
            scaled = yerr / yerr.min()
            self.scaled_err = jnp.asarray(scaled, dtype)
            self.log_scalederr_sum = float(np.sum(np.log(scaled)))

    def yobs_for(self, cell):
        return self.yobs[cell] if self.batched_obs else self.yobs


def build_evaluator(joint, priors, initparams, nl, dtype=jnp.float32,
                    use_batch_swd=False, interpret=False,
                    use_pallas_rf=None):
    """Return ``eval_fn(vs, z, n, vpvs, noise)`` for one chain model.

    ``joint`` is a host JointTarget; ``nl`` the fixed model width
    (maxlayers+1).  The returned function is pure and vmappable.
    ``interpret`` runs the pallas kernels of the batch path in
    interpret mode (CPU testing of eval_full_batch).
    ``use_pallas_rf`` overrides the BAYHUNTER_PALLAS_RF default for
    THIS evaluator (captured at build time, so two evaluators with
    different settings can coexist in one process for A/B runs).
    """
    pallas_rf = _USE_PALLAS_RF if use_pallas_rf is None \
        else bool(use_pallas_rf)
    rcond = initparams.get('rcond', None)
    # sigma-unbiased Gaussian law on the rcond-truncated subspace
    # (see likelihood.loglike_gauss_white_dof); off by default for
    # logL parity with the reference
    dof_corr = bool(initparams.get('gauss_dof_correction', False))
    mantle = priors.get('mantle', None)
    if mantle is not None:
        mantle = tuple(float(v) for v in mantle)

    # per-target corr prior (fixed vs inverted) — mirrors
    # draw_initnoiseparams (src/SingleChain.py:125-150)
    specs = []
    for target in joint.targets:
        corr_prior = priors[target.noiseref + 'noise_corr']
        corr_fixed = isinstance(corr_prior, (int, float))
        corr_value = float(corr_prior) if corr_fixed else None
        specs.append(_TargetSpec(target, corr_fixed, corr_value, rcond,
                                 dtype, dof_correction=dof_corr))

    ntargets = len(specs)

    def _loglike(spec, ydiff_safe, corr, sigma):
        if spec.cov == 'exp':
            return lk.loglike_exp(ydiff_safe, sigma, corr)
        if spec.cov == 'nocorr':
            return lk.loglike_nocorr(ydiff_safe, sigma)
        if spec.cov == 'nocorr_scalederr':
            return lk.loglike_nocorr_scalederr(
                ydiff_safe, sigma, spec.scaled_err,
                spec.log_scalederr_sum)
        if getattr(spec, 'dof_correction', False):
            return lk.loglike_gauss_white_dof(ydiff_safe, sigma,
                                              spec.whitener,
                                              spec.logcorr_det)
        return lk.loglike_gauss_white(ydiff_safe, sigma,
                                      spec.whitener, spec.logcorr_det)

    def _forward(spec, h, vp, vs_l, rho, c_prev, ring_width):
        """One target's synthetic data; returns
        (y, tvalid, roots, slopes)."""
        if spec.kind == 'custom':
            y = spec.jax_forward(h, vp, vs_l, rho)
            return (y, jnp.all(jnp.isfinite(y)),
                    jnp.zeros((0,), dtype), jnp.zeros((0,), dtype))
        if spec.kind == 'swd':
            cg, err, roots, slopes = surfdisp_roots(
                h, vp, vs_l, rho, spec.periods, c_prev=c_prev,
                iwave=spec.iwave, igr=spec.igr, mode=spec.mode,
                iflsph=spec.flsph, warm_halfwidth=ring_width,
                return_slopes=True)
            if spec.interp_x is not None:
                y = jnp.interp(spec.interp_x, spec.periods, cg)
            else:
                y = cg
            return y, jnp.logical_not(err), roots, slopes
        # rf
        qp = jnp.full((nl,), 500.0, dtype)
        qs = jnp.full((nl,), 225.0, dtype)
        vpvs0 = vp[0] / vs_l[0]
        poisson = (2.0 - vpvs0 ** 2) / (2.0 - 2.0 * vpvs0 ** 2)
        nsv = vs_l[0] if spec.nsv is None else spec.nsv
        _, _, rf_t = synrf(h, vp, vs_l, rho, qp, qs,
                           spec.p, spec.gauss_a, spec.nsamp,
                           spec.fsamp, spec.tshift, nsv,
                           poisson, wave_type=spec.wave_type)
        y = rf_t[:spec.ndata]
        return (y, jnp.all(jnp.isfinite(y)), jnp.zeros((0,), dtype),
                jnp.zeros((0,), dtype))

    def _eval(vs, z, n, vpvs, noise, cache, cell, ring_width=16):
        h, vp, vs_l, rho = voronoi_to_layers(vs, z, n, vpvs,
                                             mantle=mantle)
        logL = jnp.zeros((), dtype)
        misfits = []
        valid = jnp.asarray(True)
        new_cache = []

        for i, spec in enumerate(specs):
            c_prev = cache[i][1] if cache is not None \
                and spec.kind == 'swd' else None
            y, tvalid, roots, slopes = _forward(spec, h, vp,
                                                      vs_l, rho,
                                                      c_prev,
                                                      ring_width)
            new_cache.append((y, roots, slopes))

            ydiff = jnp.where(tvalid, y - spec.yobs_for(cell), 0.0)
            misfits.append(jnp.sqrt(jnp.mean(ydiff ** 2)))
            logL = logL + _loglike(spec, ydiff, noise[2 * i],
                                   noise[2 * i + 1])
            valid = valid & tvalid

        valid = valid & jnp.isfinite(logL)
        misfits = jnp.stack(misfits + [sum(misfits)])
        logL = jnp.where(valid, logL, LOGL_SENTINEL)
        misfits = jnp.where(valid, misfits, MISFIT_SENTINEL)
        return logL, misfits.astype(dtype), valid, tuple(new_cache)

    def eval_full(vs, z, n, vpvs, noise, cache, cell=0,
                  ring_width=16):
        """``ring_width`` (static) sets the warm-search ring size —
        dimension moves shift dispersion roots much further than
        perturbation moves, so the sampler passes a wider ring for
        birth/death steps."""
        return _eval(vs, z, n, vpvs, noise, cache, cell, ring_width)

    def eval_cold(vs, z, n, vpvs, noise, cell=0):
        return _eval(vs, z, n, vpvs, noise, None, cell)

    def eval_noise(noise, cache, cell=0):
        """Likelihood under new noise hyperparameters with the cached
        synthetic data (the model is unchanged by a noise move, so the
        forward solves and misfits are reusable)."""
        logL = jnp.zeros((), dtype)
        valid = jnp.asarray(True)
        for i, spec in enumerate(specs):
            y = cache[i][0]
            tvalid = jnp.all(jnp.isfinite(y))
            ydiff = jnp.where(tvalid, y - spec.yobs_for(cell), 0.0)
            logL = logL + _loglike(spec, ydiff, noise[2 * i],
                                   noise[2 * i + 1])
            valid = valid & tvalid
        valid = valid & jnp.isfinite(logL)
        logL = jnp.where(valid, logL, LOGL_SENTINEL)
        return logL, valid

    # ------------------------------------------------------------------
    # batch-first path: chains as a native (C, ...) leading axis so the
    # SWD solve reaches the pallas secular kernel with chains tiled 8
    # per program (the vmapped path maps each chain to a (1, L) block,
    # wasting 7/8 of the VPU sublanes).  Enabled by use_batch_swd.
    # ------------------------------------------------------------------

    def _forward_batch(spec, h, vp, vs_l, rho, c_prev, ring_width,
                       dim_move=False, pert_newton=False,
                       slope_prev=None):
        """(C, ...) variant of _forward; pallas-backed for the
        dispersion secular functions (Rayleigh and Love) and for the
        RF reflectivity recursion.  ``dim_move`` enables the
        anchor-shift warm start for birth/death proposals (see
        ops/swd.py surfdisp_roots_batch); ``pert_newton`` the Newton
        warm-start recentering for perturbation moves with large root
        shifts (vs, vp/vs); ``slope_prev`` the cached
        bracket slopes (+ exponents, required across dimension jumps)
        seeding that recentering with one sweep instead of two."""
        if spec.kind == 'rf' and pallas_rf:
            from bayhunter_tpu.ops.rf import synrf_batch
            C = h.shape[0]
            # scalar (uniform) Q enables the kernel's shared
            # phase-factor specialization (ops/pallas_rf.py q_const)
            qp, qs = 500.0, 225.0
            vpvs0 = vp[:, 0] / vs_l[:, 0]
            poisson = (2.0 - vpvs0 ** 2) / (2.0 - 2.0 * vpvs0 ** 2)
            nsv = vs_l[:, 0] if spec.nsv is None \
                else jnp.full((C,), spec.nsv, dtype)
            rf_t = synrf_batch(h, vp, vs_l, rho, qp, qs, spec.p,
                               spec.gauss_a, spec.nsamp, spec.fsamp,
                               spec.tshift, nsv, poisson,
                               wave_type=spec.wave_type,
                               interpret=interpret)
            y = rf_t[:, :spec.ndata]
            return (y, jnp.all(jnp.isfinite(y), axis=-1),
                    jnp.zeros((C, 0), dtype),
                    jnp.zeros((C, 0), dtype))
        if spec.kind == 'swd':
            from bayhunter_tpu.ops.swd import surfdisp_roots_batch
            # warm-ring trip caps (see surfdisp_roots_batch): a lane
            # beyond cap*ring_width*DDC of its (anchor-recentered)
            # start means the proposal moved the dispersion curve
            # >~0.2 km/s somewhere -> hopeless -> sentinel-reject
            # instead of paying the batch-max ring walk every step
            cap = (_DIM_TRIPS_CAP or _WARM_TRIPS_CAP) if dim_move \
                else _WARM_TRIPS_CAP
            cap = cap if c_prev is not None else None
            cg, err, roots, slopes = surfdisp_roots_batch(
                h, vp, vs_l, rho, spec.periods, c_prev=c_prev,
                iwave=spec.iwave, mode=spec.mode, igr=spec.igr,
                iflsph=spec.flsph, warm_halfwidth=ring_width,
                anchor_warm=dim_move, warm_trips_cap=cap,
                pert_newton=pert_newton, slope_prev=slope_prev,
                return_slopes=True, interpret=interpret)
            if spec.interp_x is not None:
                y = jax.vmap(lambda cc: jnp.interp(
                    spec.interp_x, spec.periods, cc))(cg)
            else:
                y = cg
            return y, jnp.logical_not(err), roots, slopes
        # everything else: vmap the per-chain forward
        y, tvalid, roots, slopes = jax.vmap(
            lambda hh, aa, bb, rr, cp: _forward(spec, hh, aa, bb, rr,
                                                cp, ring_width),
            in_axes=(0, 0, 0, 0, 0 if spec.kind == 'swd' else None)
        )(h, vp, vs_l, rho,
          c_prev if spec.kind == 'swd' else None)
        return y, tvalid, roots, slopes

    # same-wave-type SWD targets CAN share one grouped solver call in
    # the batch path (e.g. Rayleigh phase + Rayleigh group): the
    # secular kernel's fixed per-invocation cost then amortizes
    # across the targets' concatenated lanes (ops/swd.py
    # surfdisp_roots_batch_grouped).  Measured on a real v5e chip
    # (2026-08-18, 6-target joint config, scripts/bench_group_swd.py)
    # this LOSES 13% end-to-end: the concatenated lanes couple the
    # targets' warm-search trip counts — every joint call runs to the
    # max trip count over both targets with twice the lanes, which
    # outweighs the halved invocation count — so grouping defaults
    # OFF (BAYHUNTER_GROUP_SWD=1 enables, for A/B or dispatch-bound
    # configs).  The grouped warm solve supports only the newton
    # dimension prepass; with the anchor prepass configured,
    # dimension moves fall back to per-target solves.  Read at build
    # time so two evaluators with different settings can coexist in
    # one process.
    group_swd = os.environ.get('BAYHUNTER_GROUP_SWD', '0') == '1'
    swd_group_of = {}
    if group_swd:
        by_key = {}
        for i, spec in enumerate(specs):
            if spec.kind == 'swd':
                by_key.setdefault(
                    (spec.iwave, spec.flsph, spec.mode), []).append(i)
        for key, idxs in by_key.items():
            if len(idxs) > 1:
                for i in idxs:
                    swd_group_of[i] = (key, tuple(idxs))
    _dim_prepass = os.environ.get('BAYHUNTER_DIM_PREPASS', 'newton')

    def _grouped_swd_results(h, vp, vs_l, rho, cache, ring_width,
                             dim_move, pert_newton=False):
        """dict target-index -> (cg, err, roots, slopes) for grouped
        SWD targets (empty when grouping is off or unusable)."""
        if not swd_group_of or (dim_move and _dim_prepass != 'newton'):
            return {}
        from bayhunter_tpu.ops.swd import surfdisp_roots_batch_grouped
        cap = (_DIM_TRIPS_CAP or _WARM_TRIPS_CAP) if dim_move \
            else _WARM_TRIPS_CAP
        results = {}
        done = set()
        for i, (key, idxs) in swd_group_of.items():
            if idxs in done:
                continue
            done.add(idxs)
            specs_g = [specs[j] for j in idxs]
            use_sl = (_SLOPE_CACHE and pert_newton
                      and not dim_move)
            sl_prevs = [cache[j][2] for j in idxs] if use_sl else None
            outs = surfdisp_roots_batch_grouped(
                h, vp, vs_l, rho,
                [s.periods for s in specs_g],
                [s.igr for s in specs_g],
                [cache[j][1] for j in idxs],
                iwave=key[0], iflsph=key[1], mode=key[2],
                warm_halfwidth=ring_width, anchor_warm=dim_move,
                warm_trips_cap=cap, pert_newton=pert_newton,
                slope_prevs=sl_prevs,
                return_slopes=True,
                interpret=interpret)
            for j, out in zip(idxs, outs):
                results[j] = out
        return results

    def eval_full_batch(vs, z, n, vpvs, noise, cache, cell,
                        ring_width=16, dim_move=False,
                        pert_newton=False):
        """Batched eval_full: all arrays carry a leading chain axis."""
        C = vs.shape[0]
        # flat-lane batch conversion (ops/voronoi.py): the vmapped
        # per-chain path runs its elementwise chain on (C, NL) arrays
        # padded 21 -> 128 lanes
        h, vp, vs_l, rho = voronoi_to_layers_batch(vs, z, n, vpvs,
                                                   mantle=mantle)
        logL = jnp.zeros((C,), dtype)
        misfits = []
        valid = jnp.ones((C,), bool)
        new_cache = []

        grouped = _grouped_swd_results(h, vp, vs_l, rho, cache,
                                       ring_width, dim_move,
                                       pert_newton)

        for i, spec in enumerate(specs):
            if i in grouped:
                cg, errg, roots, slopes = grouped[i]
                if spec.interp_x is not None:
                    y = jax.vmap(lambda cc: jnp.interp(
                        spec.interp_x, spec.periods, cc))(cg)
                else:
                    y = cg
                tvalid = jnp.logical_not(errg)
                new_cache.append((y, roots, slopes))
                yobs = jax.vmap(spec.yobs_for)(cell) \
                    if spec.batched_obs else spec.yobs
                ydiff = jnp.where(tvalid[:, None], y - yobs, 0.0)
                misfits.append(jnp.sqrt(jnp.mean(ydiff ** 2,
                                                 axis=-1)))
                logL = logL + jax.vmap(
                    lambda yd, c0, s0: _loglike(spec, yd, c0, s0)
                )(ydiff, noise[:, 2 * i], noise[:, 2 * i + 1])
                valid = valid & tvalid
                continue
            c_prev = cache[i][1] if spec.kind == 'swd' else None
            use_sl = spec.kind == 'swd' and (
                _SLOPE_CACHE and pert_newton and not dim_move)
            slope_prev = cache[i][2] if use_sl else None
            y, tvalid, roots, slopes = _forward_batch(
                spec, h, vp, vs_l, rho, c_prev, ring_width,
                dim_move, pert_newton, slope_prev)
            new_cache.append((y, roots, slopes))

            yobs = jax.vmap(spec.yobs_for)(cell) if spec.batched_obs \
                else spec.yobs
            ydiff = jnp.where(tvalid[:, None], y - yobs, 0.0)
            misfits.append(jnp.sqrt(jnp.mean(ydiff ** 2, axis=-1)))
            logL = logL + jax.vmap(
                lambda yd, c0, s0: _loglike(spec, yd, c0, s0)
            )(ydiff, noise[:, 2 * i], noise[:, 2 * i + 1])
            valid = valid & tvalid

        valid = valid & jnp.isfinite(logL)
        misfits = jnp.stack(misfits + [sum(misfits)], axis=-1)
        logL = jnp.where(valid, logL, LOGL_SENTINEL)
        misfits = jnp.where(valid[:, None], misfits, MISFIT_SENTINEL)
        return logL, misfits.astype(dtype), valid, tuple(new_cache)

    # ------------------------------------------------------------------
    # transposed-layout batch path: model arrays (NL, C), chains on
    # lanes.  The voronoi conversion and the solver operand packs run
    # full-lane natively; the SWD solve ships the walker ONE stacked
    # props array and the RF kernel ONE per-chain operand pack.
    # ------------------------------------------------------------------

    def _forward_batch_th(spec, ht, vpt, vst, rhot, c_prev, ring_width,
                          dim_move=False, pert_newton=False,
                          slope_prev=None, mk=None):
        """(NL, C) variant of _forward_batch.  SWD and pallas-RF
        targets consume the transposed layout directly; anything else
        transposes back and reuses the row-major forward.

        ``mk``: this target's operand bundle from the unified model
        kernel (ops/pallas_prep.model_operands_t) — the layer planes
        are then None and never materialized in XLA."""
        C = mk[0].shape[1] if mk is not None else ht.shape[1]
        if spec.kind == 'rf' and pallas_rf:
            from bayhunter_tpu.ops.rf import synrf_batch
            qp, qs = 500.0, 225.0
            if mk is not None:
                # surface vp/vs from the kernel pack (rows NL / 2NL
                # are the flattened vp/vs planes, whose surface row
                # is exact — q_top(0) == 1)
                vp0, vs0 = mk[1][nl], mk[1][2 * nl]
            else:
                vp0, vs0 = vpt[0], vst[0]
            vpvs0 = vp0 / vs0
            poisson = (2.0 - vpvs0 ** 2) / (2.0 - 2.0 * vpvs0 ** 2)
            nsv = vs0 if spec.nsv is None \
                else jnp.full((C,), spec.nsv, dtype)
            rf_t = synrf_batch(ht, vpt, vst, rhot, qp, qs, spec.p,
                               spec.gauss_a, spec.nsamp, spec.fsamp,
                               spec.tshift, nsv, poisson,
                               wave_type=spec.wave_type,
                               layout_t=True, prep=mk,
                               interpret=interpret)
            y = rf_t[:, :spec.ndata]
            return (y, jnp.all(jnp.isfinite(y), axis=-1),
                    jnp.zeros((C, 0), dtype),
                    jnp.zeros((C, 0), dtype))
        if spec.kind == 'swd':
            from bayhunter_tpu.ops.swd import surfdisp_roots_batch
            cap = (_DIM_TRIPS_CAP or _WARM_TRIPS_CAP) if dim_move \
                else _WARM_TRIPS_CAP
            cap = cap if c_prev is not None else None
            cg, err, roots, slopes = surfdisp_roots_batch(
                ht, vpt, vst, rhot, spec.periods, c_prev=c_prev,
                iwave=spec.iwave, mode=spec.mode, igr=spec.igr,
                iflsph=spec.flsph, warm_halfwidth=ring_width,
                anchor_warm=dim_move, warm_trips_cap=cap,
                pert_newton=pert_newton, slope_prev=slope_prev,
                return_slopes=True,
                layout_t=True, prep=mk, interpret=interpret)
            if spec.interp_x is not None:
                y = jax.vmap(lambda cc: jnp.interp(
                    spec.interp_x, spec.periods, cc))(cg)
            else:
                y = cg
            return y, jnp.logical_not(err), roots, slopes
        return _forward_batch(spec, ht.T, vpt.T, vst.T, rhot.T,
                              c_prev, ring_width, dim_move,
                              pert_newton, slope_prev)

    def _mk_specs_static():
        """Static unified-model-kernel descriptors, one per target,
        or None when any target is outside the kernel's fast paths
        (the gates mirror the per-target dispatch in
        _forward_batch_th / ops/rf.synrf_batch)."""
        from bayhunter_tpu.ops import pallas_rf as _prf
        from bayhunter_tpu.ops.rf import DEG_PER_KM
        out = []
        for spec in specs:
            if spec.kind == 'swd':
                out.append(('swd', int(spec.iwave), int(spec.flsph)))
            elif spec.kind == 'rf' and pallas_rf:
                packed_ok = (
                    os.environ.get('BAYHUNTER_RF_QCONST', '1') == '1'
                    and _prf.SCAL_XLA and _prf.DYNAMIC_NL != 'loop'
                    and os.environ.get('BAYHUNTER_RF_COEFF_XLA',
                                       '1') == '1')
                if not packed_ok:
                    return None
                out.append(('rf', float(spec.p) * DEG_PER_KM,
                            int(spec.wave_type), True))
            else:
                return None
        return tuple(out)

    def mk_ok(dim_move):
        """True when the unified model kernel can serve EVERY target
        of this configuration for a warm transposed-layout step (the
        caller must also hold a forward cache — always true on the
        production step path)."""
        from bayhunter_tpu.ops.swd import t_walker_ok
        if dtype != jnp.float32 or _mk_specs_static() is None:
            return False
        for spec in specs:
            if spec.kind != 'swd':
                continue
            nlan = (2 if spec.igr else 1) * int(spec.periods.shape[0])
            if not t_walker_ok(nlan, True, dim_move, dtype):
                return False
        return True

    def eval_full_batch_t(vs_t, z_t, n, vpvs, noise, cache, cell,
                          ring_width=16, dim_move=False,
                          pert_newton=False, mk_cfg=None):
        """Batched eval_full on TRANSPOSED (NL, C) model arrays.
        ``noise``/``cell`` and everything derived from synthetic data
        keep the (C, ...) layout (data axes are already lane-wide).

        ``mk_cfg``: static prior-bound tuple from the sampler (see
        chain.build_sampler) enabling the unified model kernel —
        voronoi conversion, prior validity and every solver operand
        pack then run in ONE pallas program
        (ops/pallas_prep.model_operands_t) and the trailing return
        value carries the kernel's prior-validity vector.  The
        caller must have checked :func:`mk_ok` first.  None keeps
        the XLA operand path (returns mvalid=None)."""
        from bayhunter_tpu.ops.voronoi import voronoi_to_layers_T
        C = vs_t.shape[1]
        mvalid = None
        mk_res = None
        if mk_cfg is not None:
            from bayhunter_tpu.ops.pallas_prep import model_operands_t
            mvalid, mk_res = model_operands_t(
                vs_t, z_t, n, vpvs, _mk_specs_static(), mk_cfg,
                mantle=mantle, interpret=interpret)
            ht = vpt = vst = rhot = None
        else:
            ht, vpt, vst, rhot = voronoi_to_layers_T(
                vs_t, z_t, n, vpvs, mantle=mantle)
            # materialize the conversion ONCE: its outputs feed the
            # SWD pack, the RF pack, the flattening and the validity
            # chain — unfenced, XLA duplicates the voronoi math into
            # each consumer's fusion (and concat-rooted consumer
            # fusions run ~10x slow; see
            # ops/pallas_rf.interface_coeffs_xla_t)
            ht, vpt, vst, rhot = jax.lax.optimization_barrier(
                (ht, vpt, vst, rhot))
        logL = jnp.zeros((C,), dtype)
        misfits = []
        valid = jnp.ones((C,), bool)
        new_cache = []
        for i, spec in enumerate(specs):
            c_prev = cache[i][1] if spec.kind == 'swd' else None
            use_sl = spec.kind == 'swd' and (
                _SLOPE_CACHE and pert_newton and not dim_move)
            slope_prev = cache[i][2] if use_sl else None
            y, tvalid, roots, slopes = _forward_batch_th(
                spec, ht, vpt, vst, rhot, c_prev, ring_width,
                dim_move, pert_newton, slope_prev,
                mk=None if mk_res is None else mk_res[i])
            new_cache.append((y, roots, slopes))

            yobs = jax.vmap(spec.yobs_for)(cell) if spec.batched_obs \
                else spec.yobs
            ydiff = jnp.where(tvalid[:, None], y - yobs, 0.0)
            misfits.append(jnp.sqrt(jnp.mean(ydiff ** 2, axis=-1)))
            logL = logL + jax.vmap(
                lambda yd, c0, s0: _loglike(spec, yd, c0, s0)
            )(ydiff, noise[:, 2 * i], noise[:, 2 * i + 1])
            valid = valid & tvalid

        valid = valid & jnp.isfinite(logL)
        misfits = jnp.stack(misfits + [sum(misfits)], axis=-1)
        logL = jnp.where(valid, logL, LOGL_SENTINEL)
        misfits = jnp.where(valid[:, None], misfits, MISFIT_SENTINEL)
        return (logL, misfits.astype(dtype), valid, tuple(new_cache),
                mvalid)

    use_batch = bool(use_batch_swd) and dtype == jnp.float32
    # the T path duplicates the grouped-solve dispatch nowhere: with
    # grouped SWD solves configured the chain keeps the row-major path
    use_batch_t = use_batch and not swd_group_of
    return EvalBundle(eval_full, eval_cold, eval_noise, ntargets,
                      specs,
                      eval_full_batch if use_batch else None,
                      eval_full_batch_t if use_batch_t else None,
                      mk_ok if use_batch_t else None)
