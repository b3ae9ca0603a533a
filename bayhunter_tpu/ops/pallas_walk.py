"""Fused warm-root-solve pallas kernel ("the walker").

The staged warm solve (ops/swd.py `_ring_brackets_b` +
`_ksection_refine`) evaluates the secular function on wide candidate
rings — 2*K+1 lanes per period per trip plus KR+2 refinement lanes —
because each XLA-level stage must be one dense kernel call.  Measured
on-chip the secular kernel is VPU-compute-bound and linear in lanes,
so all of that width is real cost, while the MEDIAN proposal moves
the root by less than one DDC step (root-shift tails,
VALIDATION.md).

This kernel walks instead: each lane is one (chain, period) pair
carrying its own sequential nearest-first candidate walk
(+1, -1, +2, -2, ... DDC steps from the warm start), then an
in-kernel bisection of the found bracket and the same closing secant
polish the staged refiner uses.  A whole program block exits its walk as
soon as every lane has found or died, so the typical solve costs
~3-6 secular evaluations per lane instead of 33+17 — and lanes are
packed densely: each 128-lane row holds floor(128/R) chains' full
period vectors, so a program covers C_TILE * floor(128/R) chains.

Search semantics match `_ring_brackets_b` exactly where both find a
root: nearest sign change to the warm start, ties broken upward
(right side probed first at each distance), frontier signs advance
only while in [cm, betmx + DDC], a lane dies when both sides leave
the range, and the maximum walk distance is trips*K steps per side
(the warm cap's sentinel-reject contract, evaluator.py).  The
refinement guarantee matches the staged pipeline: nbisect = 4*nrefine
halves the DDC bracket to the same DDC/16^nrefine worst case, then
the secant step interpolates the bracket's secular VALUES.

Layer properties are pre-broadcast per lane on the XLA side (each
lane group is a different chain), stacked layer-major as
(T, NL, C_TILE, 128) so the in-kernel dynamic layer loop indexes the
MAJOR dim — Mosaic supports dynamic major-dim indexing but not
dynamic lane-dim vector loads (see pallas_secular._dyn_col).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayhunter_tpu.ops.pallas_secular import (C_TILE,
                                              _dltar1_layer_math,
                                              _dltar4_halfspace,
                                              _dltar4_layer_math,
                                              _var_quantities)

LANES = 128


class _StackedProp:
    """Layer-indexable view of one prop plane of the stacked
    (nprops, nl, 1, C_TILE, M) props block (transposed-layout input
    path): ``pr[0, l]`` reads plane ``k`` at layer ``l``, matching
    the per-prop ``(1, nl, C_TILE, M)`` compact read pattern."""

    def __init__(self, ref, k):
        self.ref = ref
        self.k = k

    def __getitem__(self, idx):
        _, l = idx
        return self.ref[self.k, l, 0]


def _walk_kernel(nl, iwave, max_steps, nbisect, ddc, newton_iters,
                 newton_maxshift, compact_mr, has_sl, mr,
                 stacked, *refs):
    nprops = 3 if iwave == 1 else 4
    if compact_mr is not None:
        refs, scratch = refs[:-nprops], refs[-nprops:]
    *ins, c_out, f_out, s_out = refs
    top_ref, c0_ref, om_ref, cm_ref, bx_ref = ins[:5]
    ins = ins[5:]
    sl_ref = None
    if has_sl:
        sl_ref, *ins = ins
    if stacked:
        # ONE (nprops, nl, 1, C_TILE, M) stacked props block (the
        # transposed-layout caller ships a single stack+pad instead
        # of per-prop packs): view each prop as a layer-indexable
        # getter.  Requires compact mode (per-chain columns).
        dall_ref, = ins
        prefs = tuple(
            _StackedProp(dall_ref, k) for k in range(nprops))
        if iwave == 1:
            d_ref, b_ref, rho_ref = prefs
        else:
            d_ref, a_ref, b_ref, rho_ref = prefs
    elif iwave == 1:
        d_ref, b_ref, rho_ref = ins
        prefs = (d_ref, b_ref, rho_ref)
    else:
        d_ref, a_ref, b_ref, rho_ref = ins
        prefs = (d_ref, a_ref, b_ref, rho_ref)
    top = jnp.minimum(top_ref[0, pl.program_id(0)], nl - 2)
    c0 = c0_ref[0]
    dc = jnp.float32(ddc)

    # lane -> chain-group map (padding lanes >= M*R take group 0,
    # matching _pack's first-lane padding so every padded lane is an
    # exact duplicate of lane 0 and exits the walk with it)
    M, R = mr
    C_T, LANESK = c0.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (C_T, LANESK), 1)
    group = jnp.where(lane < M * R, lane // R, 0)

    def expand_cols(row):
        """(C_TILE, M) per-chain columns -> (C_TILE, LANES) lanes."""
        out = jnp.zeros((C_T, LANESK), row.dtype)
        for m in range(M):
            out = jnp.where(group == m, row[:, m:m + 1], out)
        return out

    # omegas ride ONE (C_TILE, LANES) block shared by every program
    # (the period row is a per-solve constant, so the operand folds
    # at compile time — no per-step pack ops); cm/bx are per-chain
    # scalars shipped as (C_TILE, M) columns and expanded here.
    omega = jnp.maximum(om_ref[0], 1.0e-4)
    cm = expand_cols(cm_ref[0])
    bx = expand_cols(bx_ref[0])
    c0 = jnp.clip(c0, cm, bx)   # warm-start clip, moved from XLA

    if compact_mr is not None:
        # compact layer properties: the XLA side ships (nl, C_TILE, M)
        # per-chain columns instead of lane-broadcast (nl, C_TILE,
        # LANES) blocks (the broadcast+pad chain was ~0.2 ms of XLA
        # tail per solve and 17x the HBM traffic).  Expand ONCE into
        # VMEM scratch — only the secular-visible layers (0..top and
        # the halfspace) — with M static lane-group selects per layer.
        def expand(l, _):
            for pr, sc in zip(prefs, scratch):
                sc[l] = expand_cols(pr[0, l])       # (C_TILE, M)
            return 0

        # layer 0 is read unconditionally (water test + water-surface
        # clause), even for pure-halfspace tiles where top == -1
        jax.lax.fori_loop(0, jnp.maximum(top + 1, 1), expand, 0)
        expand(nl - 1, 0)
        if iwave == 1:
            d_ref, b_ref, rho_ref = scratch
        else:
            d_ref, a_ref, b_ref, rho_ref = scratch

        def prop(ref, l):
            return ref[l]          # (C_TILE, LANES) from VMEM scratch
    else:
        def prop(ref, l):
            return ref[0, l]       # (C_TILE, LANES), dynamic-major l

    water = prop(b_ref, 0) <= 0.0

    def secular(c):
        """Secular value at c (renormalized scale; only signs and
        same-sweep ratios reach the search logic)."""
        wvno = omega / c
        wvno2 = wvno * wvno
        if iwave == 1:
            b_hs = prop(b_ref, nl - 1)
            rho_hs = prop(rho_ref, nl - 1)
            rb = jnp.sqrt((wvno + omega / b_hs)
                          * jnp.abs(wvno - omega / b_hs))
            e = (rho_hs * rb,
                 jnp.broadcast_to(1.0 / (b_hs * b_hs), wvno.shape))

            def body(j, e_):
                l = top - j
                skip = water & (l == 0)
                return _dltar1_layer_math(
                    e_, wvno, omega, prop(d_ref, l), prop(b_ref, l),
                    prop(rho_ref, l), skip)

            e = jax.lax.fori_loop(0, top + 1, body, e)
            return e[0]
        e = _dltar4_halfspace(wvno, wvno2, omega, prop(a_ref, nl - 1),
                              prop(b_ref, nl - 1),
                              prop(rho_ref, nl - 1))

        def body(j, e_):
            l = top - j
            skip = water & (l == 0)
            return _dltar4_layer_math(
                e_, wvno, wvno2, omega, prop(d_ref, l),
                prop(a_ref, l), prop(b_ref, l), prop(rho_ref, l),
                skip)

        e = jax.lax.fori_loop(0, top + 1, body, e)
        e1, e2 = e[0], e[1]
        # water-layer surface boundary (surfdisp96.f:850-869)
        a0_l = prop(a_ref, 0)
        d0_l = prop(d_ref, 0)
        xka0 = omega / a0_l
        ra0 = jnp.sqrt((wvno + xka0) * jnp.abs(wvno - xka0))
        cosp_w, w_w, _, _ = _var_quantities(ra0 * d0_l, ra0,
                                            wvno < xka0, d0_l)
        return jnp.where(water, cosp_w * e1 - prop(rho_ref, 0)
                         * w_w * e2, e1)

    # in-kernel Newton prepass (dimension-move warm starts): the
    # XLA-level prepass pays two dispatched secular calls whose 42
    # live lanes pad to 128; here the same recentering reuses this
    # kernel's densely packed lanes for free.  Same math as the
    # ops/swd.py prepass: value+slope from a DDC/16 finite
    # difference, shift clipped to newton_maxshift per iteration.
    eps_n = dc / 16.0
    if newton_iters > 0:
        if has_sl:
            # CACHED-SLOPE first iteration (1 sweep): the previous
            # solve's closing-bracket slope rides the forward cache.
            # The secular renormalization scale is a continuous
            # function of (model, c), so for a same-dimension
            # (perturbation) proposal the cached dval/dc is directly
            # scale-compatible with this sweep's value.  (DIMENSION
            # proposals never take this path: a ±1-layer jump changes
            # the renormalization depth, and the round-4/5
            # exponent-rescale experiment proved the rescale exact
            # but the old-model slopes too STALE for death-like
            # proposals — miss class 2x, dim rejects 10.95 → 26.1%
            # on-chip — so dim moves keep the FD pair and the whole
            # exponent-tracking infrastructure was deleted per the
            # dead-knob policy; see docs/performance.md.)  Lanes with
            # the 0.0 no-cache sentinel skip recentering (shift 0).
            v0 = secular(c0)
            sl = sl_ref[0]
            hasf = jnp.where(jnp.abs(sl_ref[0]) > 0.0, 1.0, 0.0)
            slope = jnp.where(hasf > 0.5, sl, 1.0)
            shift = jnp.clip(-v0 / slope, -newton_maxshift,
                             newton_maxshift) * hasf
        else:
            # value + finite-difference slope (2 sweeps)
            hasf = 1.0
            v0 = secular(c0)
            v1 = secular(c0 + eps_n)
            slope = (v1 - v0) / eps_n
            slope = jnp.where(slope == 0.0, 1.0, slope)
            shift = jnp.clip(-v0 / slope, -newton_maxshift,
                             newton_maxshift)
        c_pv, v_pv = c0, v0
        c0 = jnp.clip(c0 + shift, cm, bx)
        # follow-up iterations: SECANT slope across the actual
        # previous step — one secular sweep each instead of two.
        # Values from different sweeps carry different accumulated
        # renormalization scales, but the scale is a deterministic
        # continuous positive function of c (pallas_secular mode
        # note), so the secant acts on the same scaled function the
        # FD slope already does.  Lanes whose previous step was
        # smaller than the FD epsilon keep the previous slope (a
        # near-zero step means the start was already recentered; a
        # tiny-denominator secant would fling it by maxshift).
        # BAYHUNTER_NEWTON_SECANT=0 restores two-sweep FD Newton for
        # every iteration (A/B arm).
        use_secant = os.environ.get('BAYHUNTER_NEWTON_SECANT',
                                    '1') == '1'
        for _ in range(newton_iters - 1):
            v0 = secular(c0)
            if use_secant:
                step = c0 - c_pv
                sec = (v0 - v_pv) / jnp.where(step == 0.0, 1.0,
                                              step)
                slope = jnp.where(jnp.abs(step) > eps_n, sec, slope)
            else:
                v1 = secular(c0 + eps_n)
                slope = (v1 - v0) / eps_n
            slope = jnp.where(slope == 0.0, 1.0, slope)
            shift = jnp.clip(-v0 / slope, -newton_maxshift,
                             newton_maxshift) * hasf
            c_pv, v_pv = c0, v0
            c0 = jnp.clip(c0 + shift, cm, bx)

    f0 = secular(c0)
    # Mosaic cannot round-trip i1 vectors through loop carries
    # (arith.trunci i8->i1 fails to lower), so every carried mask is
    # f32 0/1 and rebuilt as bool where needed
    s0f = jnp.where(f0 > 0, 1.0, 0.0)

    zero = jnp.zeros_like(s0f)
    st0 = (jnp.int32(0), s0f, s0f, f0, f0, zero, zero,
           cm, cm + dc, f0, f0)

    def cond(st):
        t, _, _, _, _, foundf, deadf, _, _, _, _ = st
        return (t < max_steps) & (
            jnp.min(jnp.maximum(foundf, deadf)) < 0.5)

    def body(st):
        (t, sRf, sLf, fR, fL, foundf, deadf, lo, hi, f_lo,
         f_hi) = st
        k = (t // 2 + 1).astype(jnp.float32) * dc
        right = (t % 2) == 0
        cand = jnp.where(right, c0 + k, c0 - k)
        # i1-vector select is unsupported (arith.select on i1) —
        # select between the two validity tests in f32
        valid = jnp.where(right,
                          jnp.where(cand <= bx + dc, 1.0, 0.0),
                          jnp.where(cand >= cm, 1.0, 0.0)) > 0.5
        f = secular(cand)
        s = f > 0
        sprev = jnp.where(right, sRf, sLf) > 0.5
        fprev = jnp.where(right, fR, fL)
        flip = (s != sprev) & valid & (foundf < 0.5) & (deadf < 0.5)
        lo_n = jnp.where(right, cand - dc, cand)
        hi_n = jnp.where(right, cand, cand + dc)
        flo_n = jnp.where(right, fprev, f)
        fhi_n = jnp.where(right, f, fprev)
        lo = jnp.where(flip, lo_n, lo)
        hi = jnp.where(flip, hi_n, hi)
        f_lo = jnp.where(flip, flo_n, f_lo)
        f_hi = jnp.where(flip, fhi_n, f_hi)
        foundf = jnp.maximum(foundf, jnp.where(flip, 1.0, 0.0))
        sf = jnp.where(s, 1.0, 0.0)
        sRf = jnp.where(right & valid, sf, sRf)
        fR = jnp.where(right & valid, f, fR)
        sLf = jnp.where(jnp.logical_not(right) & valid, sf, sLf)
        fL = jnp.where(jnp.logical_not(right) & valid, f, fL)
        # dead once BOTH sides' candidates at this distance are out
        # of range (checked after the L probe so each distance k gets
        # its R and L chances first)
        both_out = ((c0 + k) > bx + dc) & ((c0 - k) < cm)
        deadf = jnp.maximum(
            deadf,
            jnp.where(jnp.logical_not(right) & both_out, 1.0, 0.0))
        return (t + 1, sRf, sLf, fR, fL, foundf, deadf, lo, hi,
                f_lo, f_hi)

    st = jax.lax.while_loop(cond, body, st0)
    (_, _, _, _, _, foundf, _, lo, hi, f_lo, f_hi) = st

    def bisect(_, st_):
        lo_, hi_, flo_, fhi_ = st_
        mid = 0.5 * (lo_ + hi_)
        fm = secular(mid)
        same = (fm > 0) == (flo_ > 0)
        upd = foundf > 0.5
        lo_ = jnp.where(upd & same, mid, lo_)
        flo_ = jnp.where(upd & same, fm, flo_)
        hi_ = jnp.where(upd & jnp.logical_not(same), mid, hi_)
        fhi_ = jnp.where(upd & jnp.logical_not(same), fm, fhi_)
        return lo_, hi_, flo_, fhi_

    lo, hi, f_lo, f_hi = jax.lax.fori_loop(
        0, nbisect, bisect, (lo, hi, f_lo, f_hi))

    # closing secant polish on the bracket values (ops/swd.py
    # _ksection_refine's final step).  Out-of-bracket secant means an
    # endpoint value is numerically zero — the endpoint IS the root
    # (Newton-recentered warm starts land exactly there); return the
    # smaller-|f| endpoint, NOT the midpoint (a width/2 systematic
    # error for every converged start).
    denom = f_hi - f_lo
    denom = jnp.where(denom == 0.0, 1.0, denom)
    c = lo - f_lo * (hi - lo) / denom
    edge = jnp.where(jnp.abs(f_lo) <= jnp.abs(f_hi), lo, hi)
    good = (c > lo) & (c < hi) & jnp.isfinite(c)
    c_out[0] = jnp.where(good, c, edge)
    f_out[0] = foundf
    # the bracket's secular slope, free from the refined endpoint
    # values — cached by the evaluator to seed the NEXT perturbation
    # solve's Newton recentering without an FD partner sweep.  0.0 is
    # the no-cache sentinel (unfound lanes).
    width = hi - lo
    sl_out = (f_hi - f_lo) / jnp.where(width == 0.0, 1.0, width)
    s_out[0] = jnp.where(foundf > 0.5, sl_out, 0.0)


def _pack(x, T, M, R):
    """(C, R) -> (T, C_TILE, M*R padded to LANES)."""
    xt = x.reshape(T, C_TILE, M, R).reshape(T, C_TILE, M * R)
    if M * R < LANES:
        pad = jnp.broadcast_to(xt[..., :1], (T, C_TILE,
                                             LANES - M * R))
        xt = jnp.concatenate([xt, pad], axis=-1)
    return xt


def _pack_props(p, T, M, R, nl):
    """(C, NL) -> (T, NL, C_TILE, LANES) with each lane group m
    carrying its chain's per-layer value broadcast over the R
    periods."""
    pt = p.reshape(T, C_TILE, M, nl)
    pt = jnp.moveaxis(pt, -1, 1)                    # (T, NL, 8, M)
    pt = jnp.broadcast_to(pt[..., None],
                          (T, nl, C_TILE, M, R))
    pt = pt.reshape(T, nl, C_TILE, M * R)
    if M * R < LANES:
        pad = jnp.broadcast_to(pt[..., :1],
                               (T, nl, C_TILE, LANES - M * R))
        pt = jnp.concatenate([pt, pad], axis=-1)
    return pt


def warm_roots_walk(h, vp, vs, rho, omegas, c_prev, cm, betmx, ddc,
                    iwave=2, ring_k=16, trips=2, nbisect=4,
                    newton_iters=0, newton_maxshift=0.0,
                    slope_prev=None, layout_t=False,
                    pstack=None, top_chain=None, interpret=False):
    """Warm root solve via the walking kernel.

    h/vp/vs/rho : (C, NL); omegas/c_prev (C, R); cm/betmx (C, 1).
    Returns (c, found, slope) each (C, R): the refined root
    nearest c_prev, whether one was bracketed within trips*ring_k
    steps, and the refined bracket's secular slope (0.0 for unfound
    lanes) — cacheable to seed the next perturbation solve's
    recentering.
    ``newton_iters`` > 0 runs that many in-kernel Newton recentering
    passes on c_prev before the walk (the dimension-move prepass,
    ops/swd.py), each shift clipped to ``newton_maxshift``;
    ``slope_prev`` (C, R, optional) supplies a cached slope for the
    FIRST pass so it costs one secular sweep instead of two (0.0
    lanes skip recentering).  Same-dimension solves only — see the
    in-kernel cached-slope note for why dimension moves keep the FD
    pair.
    """
    C, R = omegas.shape
    nprops_in = 3 if iwave == 1 else 4
    nl = (pstack.shape[0] // nprops_in if pstack is not None
          else (h.shape[0] if layout_t else h.shape[-1]))
    dtype = omegas.dtype
    M = max(1, LANES // R)
    G = C_TILE * M                       # chains per program
    Cp = -(-C // G) * G
    if pstack is not None:
        # prebuilt stacked props from the unified model kernel
        # (ops/pallas_prep.model_operands_t): ((P*NL), C) -> a FREE
        # reshape to the (P, NL, C) stack the T path builds itself
        if not layout_t:
            raise ValueError('pstack requires layout_t')
        pstack = pstack.reshape(nprops_in, nl, C)
    if layout_t and pstack is None:
        # transposed (NL, C) props: ONE stack + ONE lane pad covers
        # all prop planes (the row-major path pays a reshape +
        # moveaxis copy PER prop); chain c maps to (t, s, m) with
        # c = (t*C_TILE + s)*M + m in both layouts, so c0p/cm/bx
        # packs line up unchanged.
        props = (h, vs, rho) if iwave == 1 else (h, vp, vs, rho)
        # barrier: keep the upstream voronoi math out of the stack
        # concatenate's fusion (concat-rooted mega-fusions run ~10x
        # slower than math + concat split; see interface_coeffs_xla_t)
        props = jax.lax.optimization_barrier(tuple(props))
        pstack = jnp.stack(props, axis=0)            # (P, NL, C)
    if layout_t and Cp != C:
        pstack = jnp.concatenate(
            [pstack, jnp.broadcast_to(
                pstack[..., :1],
                pstack.shape[:-1] + (Cp - C,))], axis=-1)
        if top_chain is not None:
            top_chain = jnp.concatenate(
                [top_chain,
                 jnp.broadcast_to(top_chain[:1], (Cp - C,))])
    if Cp != C:
        def padc(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (Cp - C,) + x.shape[1:])],
                axis=0)
        omegas, c_prev, cm, betmx = (
            padc(x) for x in (omegas, c_prev, cm, betmx))
        if not layout_t:
            h, vp, vs, rho = (padc(x) for x in (h, vp, vs, rho))
        if slope_prev is not None:
            slope_prev = padc(slope_prev)
    T = Cp // G

    if R > LANES:
        raise ValueError('walker supports R <= 128 lanes per chain '
                         '(got %d)' % R)

    # Compact prop shipping (session-9 on-chip A/B: bitwise-equal to
    # the dense path, +2.5% @512 / wash @10240, and the walker's prop
    # input bytes shrink by ~R): default on; =0 restores dense blocks.
    compact = os.environ.get('BAYHUNTER_WALK_COMPACT', '1') == '1'
    # warm starts are clipped to [cm, bx] IN-KERNEL (the XLA clip was
    # a padded (C, R) op); cm/bx ship as compact per-chain columns
    # and omegas as ONE shared block — with a constant period row
    # (the production case) the operand folds at compile time,
    # removing the whole broadcast+tile+pad chain from the step.
    c0p = _pack(c_prev, T, M, R)
    # NOTE: omegas rows are chain-invariant by construction (the
    # period row broadcast in surfdisp_roots_batch) — one shared
    # block serves every program
    om_row = omegas[0]                               # (R,)
    om_lane = jnp.tile(om_row, M)
    if M * R < LANES:
        om_lane = jnp.concatenate(
            [om_lane, jnp.broadcast_to(om_lane[:1], (LANES - M * R,))])
    omp = jnp.broadcast_to(om_lane[None, None, :],
                           (1, C_TILE, LANES))
    cmp_ = cm[:, 0].reshape(T, C_TILE, M)
    bxp = betmx[:, 0].reshape(T, C_TILE, M)
    slp = None if slope_prev is None else _pack(slope_prev, T, M, R)
    nprops = 3 if iwave == 1 else 4
    if layout_t:
        if not compact:
            raise ValueError('layout_t requires compact prop '
                             'shipping (BAYHUNTER_WALK_COMPACT=1)')
        # (P, NL, Cp) -> (P, NL, T, C_TILE, M): a FREE reshape (the
        # split of the minor axis is row-major in both views)
        dprops = [pstack.reshape(nprops, nl, T, C_TILE, M)]
        if top_chain is not None:
            # per-chain skip depth from the model kernel: the
            # per-program value is the group max (identical to the
            # act-based reduction below)
            top = jnp.max(top_chain.reshape(T, G),
                          axis=1).astype(jnp.int32).reshape(1, -1)
        else:
            act_t = (pstack[0] > 0.0).reshape(nl, T, G).any(axis=2)
            idx = jnp.arange(nl, dtype=jnp.int32)
            top = jnp.max(jnp.where(act_t, idx[:, None], -1),
                          axis=0).astype(jnp.int32).reshape(1, -1)
    else:
        props = (h, vs, rho) if iwave == 1 else (h, vp, vs, rho)
        if compact:
            # (C, NL) -> (T, NL, C_TILE, M): per-chain columns,
            # expanded to lane groups inside the kernel
            # (see _walk_kernel)
            dprops = [jnp.moveaxis(p.reshape(T, C_TILE, M, nl), -1, 1)
                      for p in props]
        else:
            dprops = [_pack_props(p, T, M, R, nl) for p in props]

        # deepest consequential layer per program (chains grouped G
        # per program; resort keeps them n-homogeneous)
        act = (h > 0.0).reshape(T, G, nl).any(axis=1)
        idx = jnp.arange(nl, dtype=jnp.int32)
        # (1, T) SMEM row — see pallas_secular top-row note
        top = jnp.max(jnp.where(act, idx, -1), axis=-1,
                      keepdims=True).astype(jnp.int32).reshape(1, -1)

    grid = (T,)

    def spec2(width):
        return pl.BlockSpec((1, C_TILE, width), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_shared(width):
        # one block shared by every program (chain-invariant operand)
        return pl.BlockSpec((1, C_TILE, width), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec_cols():
        # (T, C_TILE, M) per-chain scalar columns
        return pl.BlockSpec((1, C_TILE, M), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def spec3(width):
        return pl.BlockSpec((1, nl, C_TILE, width),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    if layout_t:
        prop_specs = [pl.BlockSpec((nprops, nl, 1, C_TILE, M),
                                   lambda i: (0, 0, i, 0, 0),
                                   memory_space=pltpu.VMEM)]
    else:
        prop_specs = [spec3(M if compact else LANES)] * len(dprops)
    in_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM),
                 spec2(LANES), spec_shared(LANES),
                 spec_cols(), spec_cols()]
                + ([] if slp is None else [spec2(LANES)])
                + prop_specs)
    out_specs = [spec2(LANES)] * 3
    max_steps = 2 * ring_k * trips
    scratch_shapes = ([pltpu.VMEM((nl, C_TILE, LANES), dtype)]
                      * nprops) if compact else []

    args = ((top, c0p, omp, cmp_, bxp)
            + (() if slp is None else (slp,)) + tuple(dprops))
    c_pk, f_pk, s_pk = pl.pallas_call(
        functools.partial(_walk_kernel, nl, iwave, max_steps,
                          nbisect, float(ddc), int(newton_iters),
                          float(newton_maxshift),
                          (M, R) if compact else None,
                          slp is not None, (M, R),
                          bool(layout_t)),
        out_shape=[jax.ShapeDtypeStruct((T, C_TILE, LANES), dtype)]
        * 3,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(*args)

    def unpack(xp):
        x = xp[..., :M * R].reshape(T, C_TILE, M, R)
        return x.reshape(Cp, R)[:C]

    return unpack(c_pk), unpack(f_pk) > 0.5, unpack(s_pk)
