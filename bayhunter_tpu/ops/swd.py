"""Surface-wave dispersion forward solver (pure JAX, batch-first).

Computes Love/Rayleigh phase or group velocity dispersion curves for a
stack of flat (or earth-flattened spherical) layers — the TPU-native
equivalent of the reference's Fortran SURF96 solver
(reference: src/extensions/surfdisp96.f:55-1068).

Numerics match the reference:
  * Rayleigh (P-SV) secular function: Dunkin 5-component compound
    matrix recursion from the halfspace upward, with per-layer
    max-abs renormalization (reference ``dltar4``/``dnka``/``var``/
    ``normc``, surfdisp96.f:773-1068).
  * Love (SH): 2-vector Haskell recursion (reference ``dltar1``,
    surfdisp96.f:710-769).
  * Spherical earth flattening with layer-midpoint velocity mapping
    and Biswas density mapping (reference ``sphere``,
    surfdisp96.f:486-553).
  * Group velocity from two phase solves at ``t/(1±h)``, h=0.005
    (reference surfdisp96.f:232-239, 282-307).

The *root search* is redesigned TPU-first.  The reference walks the
phase-velocity axis sequentially per period, threading the previous
period's root as a starting guess (``getsol``/``nevill``,
surfdisp96.f:390-482, 557-674) — a long serial dependence chain that
is hostile to a vector machine.  Here every period is independent:

  1. **Block bracketing with root counting.**  The secular function is
     evaluated on blocks of K phase-velocity grid points (step DDC,
     the reference's ddc) simultaneously for all periods, walking up
     from the same guaranteed lower bound ``cm`` the reference uses
     for its first period (surfdisp96.f:140-217).  The m-th sign
     change *is* the m-th mode — higher modes come from counting sign
     changes instead of the reference's fragile mode-jump guards.
  2. **K-section refinement.**  The bracket (width DDC) is narrowed by
     a factor (KR+1) per iteration by evaluating KR interior points at
     once — 3 iterations reach DDC/(KR+1)^3 ≈ 1e-6 km/s, replacing
     ~30 serial bisection steps with 3 wide vector steps.

Only the *sign* of the secular function is consumed, which is
invariant under the per-layer positive renormalization, so no
extended-exponent bookkeeping is needed.

Shape contract: all layer arrays are fixed-width ``(NL,)`` with the
halfspace in the LAST slot and zero-thickness padded slots replicating
the halfspace in between (see ops/voronoi.py).  A zero-thickness layer
contributes an identity propagator, so padding never changes results.
No data-dependent shapes anywhere; everything vmaps over a chain axis.
"""

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# Pallas secular-function kernel (TPU): keeps the whole Dunkin layer
# recursion in VMEM.  Off by default so CPU tests and f64 golden runs
# use the portable XLA path; the optimizer/bench enable it on TPU.
# Values: '1' on, '0' off (also via env BAYHUNTER_PALLAS).
USE_PALLAS = os.environ.get('BAYHUNTER_PALLAS', '0') == '1'

# Optional override of the f32 refinement-pass count (see
# surfdisp_roots_batch): the secant polish makes one sign pass enough
# for phase solves in the typical smooth case, but its worst case is
# the DDC/16 bracket width; set BAYHUNTER_NREFINE=2 (or 3) when
# inverting data whose noise floor approaches ~1e-4 km/s.
_NREFINE_ENV = os.environ.get('BAYHUNTER_NREFINE', '')
NREFINE_F32 = int(_NREFINE_ENV) if _NREFINE_ENV else None

TWOPI = 2.0 * jnp.pi
DDC = 0.005          # phase-velocity grid step (surfdisp96.f:126)
HGR = 0.005          # group-velocity frequency increment (surfdisp96.f:128)
EARTH_R = 6370.0     # sphere(): ar (surfdisp96.f:517)


# --------------------------------------------------------------------------
# secular functions — candidate-parallel over arbitrary wvno shapes
# --------------------------------------------------------------------------

def _vertical_wavenumber(wvno, xk):
    """r = sqrt(|wvno^2 - xk^2|) via the reference's (wvno+xk)(|wvno-xk|)
    product form (surfdisp96.f:790-795)."""
    return jnp.sqrt((wvno + xk) * jnp.abs(wvno - xk))


def _var_quantities(pq, r, wvno, xk, dpth):
    """Scaled cosP/sinP eigenfunction quantities for one wave type.

    Port of the P- or S-half of subroutine ``var``
    (surfdisp96.f:874-991).  Returns (cos_, w_, x_, exponent) where for
    the evanescent regime cos/sin carry an implicit factor exp(+pq)
    tracked in ``exponent``.  Only relative magnitudes and signs reach
    the root finder, so the exponent is used solely to combine P and S
    scalings consistently inside one layer.
    """
    prop = wvno < xk  # propagating regime
    r_safe = jnp.where(r == 0.0, 1.0, r)

    sin_p = jnp.sin(pq)
    w_prop = jnp.where(r == 0.0, dpth, sin_p / r_safe)
    x_prop = -r * sin_p
    cos_prop = jnp.cos(pq)

    fac = jnp.where(pq < 16.0, jnp.exp(-2.0 * pq), 0.0)
    cos_ev = 0.5 * (1.0 + fac)
    sin_ev = 0.5 * (1.0 - fac)
    w_ev = jnp.where(r == 0.0, dpth, sin_ev / r_safe)
    x_ev = r * sin_ev

    cos_ = jnp.where(prop, cos_prop, cos_ev)
    w_ = jnp.where(prop, w_prop, w_ev)
    x_ = jnp.where(prop, x_prop, x_ev)
    ex = jnp.where(prop, 0.0, pq)
    return cos_, w_, x_, ex


def _dnka_apply(e, wvno2, gam, gammk, rho, a0, cpcq, cpy, cpz, cqw, cqx,
                xy, xz, wy, wz):
    """Apply Dunkin's 5x5 compound matrix to the E row-vector:
    ``e_new_j = sum_i e_i * ca_ij`` (surfdisp96.f:1024-1068).

    The matrix is never materialized — the 25 entries (with their
    symmetry shortcuts) contract against ``e`` (a 5-tuple of
    candidate-shaped arrays) elementwise, keeping the whole recursion
    on the VPU instead of MXU-padded tiny dot ops.
    """
    one, two = 1.0, 2.0
    gamm1 = gam - one
    twgm1 = gam + gamm1
    gmgmk = gam * gammk
    gmgm1 = gam * gamm1
    gm1sq = gamm1 * gamm1
    rho2 = rho * rho
    a0pq = a0 - cpcq

    ca11 = cpcq - two * gmgm1 * a0pq - gmgmk * xz - wvno2 * gm1sq * wy
    ca12 = (wvno2 * cpy - cqx) / rho
    ca13 = -(twgm1 * a0pq + gammk * xz + wvno2 * gamm1 * wy) / rho
    ca14 = (cpz - wvno2 * cqw) / rho
    ca15 = -(two * wvno2 * a0pq + xz + wvno2 * wvno2 * wy) / rho2
    ca21 = (gmgmk * cpz - gm1sq * cqw) * rho
    ca22 = cpcq
    ca23 = gammk * cpz - gamm1 * cqw
    ca24 = -wz
    ca25 = ca14
    ca41 = (gm1sq * cpy - gmgmk * cqx) * rho
    ca42 = -xy
    ca43 = gamm1 * cpy - gammk * cqx
    ca44 = ca22
    ca45 = ca12
    ca51 = -(two * gmgmk * gm1sq * a0pq + gmgmk * gmgmk * xz
             + gm1sq * gm1sq * wy) * rho2
    ca52 = ca41
    ca53 = -(gammk * gamm1 * twgm1 * a0pq + gam * gammk * gammk * xz
             + gamm1 * gm1sq * wy) * rho
    ca54 = ca21
    ca55 = ca11
    t = -two * wvno2
    ca31 = t * ca53
    ca32 = t * ca43
    ca33 = a0 + two * (cpcq - ca11)
    ca34 = t * ca23
    ca35 = t * ca13

    e1, e2, e3, e4, e5 = e
    return (e1 * ca11 + e2 * ca21 + e3 * ca31 + e4 * ca41 + e5 * ca51,
            e1 * ca12 + e2 * ca22 + e3 * ca32 + e4 * ca42 + e5 * ca52,
            e1 * ca13 + e2 * ca23 + e3 * ca33 + e4 * ca43 + e5 * ca53,
            e1 * ca14 + e2 * ca24 + e3 * ca34 + e4 * ca44 + e5 * ca54,
            e1 * ca15 + e2 * ca25 + e3 * ca35 + e4 * ca45 + e5 * ca55)


def dltar4(wvno, omega, d, a, b, rho, water):
    """Rayleigh-wave period (secular) equation.

    Port of ``dltar4`` (surfdisp96.f:773-871), candidate-parallel:
    ``wvno``/``omega`` may have any (broadcastable) shape S;
    ``d,a,b,rho`` are ``(NL,)`` padded layer arrays with the halfspace
    in the last slot; ``water`` is a boolean scalar (surface water
    layer present).  Returns shape-S values whose sign matches the
    reference; the positive scale is arbitrary due to per-layer
    renormalization.
    """
    return _dltar4_impl(wvno, omega, d, a, b, rho, water)


def _dltar4_impl(wvno, omega, d, a, b, rho, water):
    omega = jnp.maximum(omega, 1.0e-4)
    wvno, omega = jnp.broadcast_arrays(wvno, omega)
    wvno2 = wvno * wvno

    # halfspace E vector (surfdisp96.f:798-808)
    ra_hs = _vertical_wavenumber(wvno, omega / a[-1])
    rb_hs = _vertical_wavenumber(wvno, omega / b[-1])
    t_hs = b[-1] / omega
    gammk_hs = 2.0 * t_hs * t_hs
    gam_hs = gammk_hs * wvno2
    gamm1_hs = gam_hs - 1.0
    rho_hs = rho[-1]
    e = (rho_hs * rho_hs * (gamm1_hs * gamm1_hs
                            - gam_hs * gammk_hs * ra_hs * rb_hs),
         (-rho_hs * ra_hs).astype(wvno.dtype),
         rho_hs * (gamm1_hs - gammk_hs * ra_hs * rb_hs),
         (rho_hs * rb_hs).astype(wvno.dtype),
         wvno2 - ra_hs * rb_hs)  # 5-tuple, each shape S

    nl = d.shape[-1]
    # propagate from the layer above the halfspace (slot NL-2) up to the
    # surface (slot 0); a surface water layer (slot 0) is skipped here
    # and handled by the water boundary below.
    order = jnp.arange(nl - 2, -1, -1)
    xs = (d[order], a[order], b[order], rho[order],
          water & (order == 0))

    def step(ee, layer):
        d_l, a_l, b_l, rho_l, skip = layer
        xka = omega / a_l
        xkb = omega / b_l
        ra = _vertical_wavenumber(wvno, xka)
        rb = _vertical_wavenumber(wvno, xkb)
        t_l = b_l / omega
        gammk = 2.0 * t_l * t_l
        gam = gammk * wvno2

        cosp, w, x, pex = _var_quantities(ra * d_l, ra, wvno, xka, d_l)
        cosq, y, z, sex = _var_quantities(rb * d_l, rb, wvno, xkb, d_l)
        exa = pex + sex
        a0 = jnp.where(exa < 60.0, jnp.exp(-exa), 0.0)

        een = _dnka_apply(ee, wvno2, gam, gammk, rho_l, a0,
                          cosp * cosq, cosp * y, cosp * z, cosq * w,
                          cosq * x, x * y, x * z, w * y, w * z)
        nrm = jnp.abs(een[0])
        for comp in een[1:]:
            nrm = jnp.maximum(nrm, jnp.abs(comp))
        nrm = jnp.where(nrm < 1e-40, 1.0, nrm)
        out = tuple(jnp.where(skip, ec, en / nrm)
                    for ec, en in zip(ee, een))
        return out, None

    e, _ = lax.scan(step, e, xs)

    # water-layer surface boundary (surfdisp96.f:850-869)
    ra0 = _vertical_wavenumber(wvno, omega / a[0])
    cosp_w, w_w, _, _ = _var_quantities(ra0 * d[0], ra0, wvno,
                                        omega / a[0], d[0])
    w0 = -rho[0] * w_w
    return jnp.where(water, cosp_w * e[0] + w0 * e[1], e[0])


def dltar1(wvno, omega, d, a, b, rho, water):
    """Love-wave period (secular) equation.

    Port of ``dltar1`` (surfdisp96.f:710-769): 2-vector Haskell
    recursion from the halfspace up, with per-layer renormalization,
    candidate-parallel over the shape of ``wvno``.  A surface water
    layer is skipped (llw=2 semantics).
    """
    return _dltar1_impl(wvno, omega, d, a, b, rho, water)


def _dltar1_impl(wvno, omega, d, a, b, rho, water):
    wvno, omega = jnp.broadcast_arrays(wvno, omega)
    rb_hs = _vertical_wavenumber(wvno, omega / b[-1])
    e1 = (rho[-1] * rb_hs).astype(wvno.dtype)
    e2 = jnp.broadcast_to(
        jnp.asarray(1.0 / (b[-1] * b[-1]), wvno.dtype), wvno.shape)

    nl = d.shape[-1]
    order = jnp.arange(nl - 2, -1, -1)
    xs = (d[order], b[order], rho[order], water & (order == 0))

    def step(carry, layer):
        e1c, e2c = carry
        d_l, b_l, rho_l, skip = layer
        xkb = omega / b_l
        rb = _vertical_wavenumber(wvno, xkb)
        xmu = rho_l * b_l * b_l
        cosq, y, z, _ = _var_quantities(rb * d_l, rb, wvno, xkb,
                                        d_l)
        e10 = e1c * cosq + e2c * xmu * z
        e20 = e1c * y / xmu + e2c * cosq
        nrm = jnp.maximum(jnp.abs(e10), jnp.abs(e20))
        nrm = jnp.where(nrm < 1e-40, 1.0, nrm)
        e1n = jnp.where(skip, e1c, e10 / nrm)
        e2n = jnp.where(skip, e2c, e20 / nrm)
        return (e1n, e2n), None

    (e1, e2), _ = lax.scan(step, (e1, e2), xs)
    return e1


# --------------------------------------------------------------------------
# starting solution & flattening
# --------------------------------------------------------------------------

def gtsolh(a, b):
    """Halfspace Rayleigh-velocity starting solution: 5 Newton steps on
    the halfspace period equation (surfdisp96.f:367-388)."""
    c = 0.95 * b
    for _ in range(5):
        gamma = b / a
        kappa = c / b
        k2 = kappa * kappa
        gk2 = (gamma * kappa) ** 2
        fac1 = jnp.sqrt(jnp.maximum(1.0 - gk2, 1e-30))
        fac2 = jnp.sqrt(jnp.maximum(1.0 - k2, 1e-30))
        fr = (2.0 - k2) ** 2 - 4.0 * fac1 * fac2
        frp = (-4.0 * (2.0 - k2) * kappa
               + 4.0 * fac2 * gamma * gamma * kappa / fac1
               + 4.0 * fac1 * kappa / fac2)
        frp = frp / b
        c = c - fr / frp
    return c


def sphere_flatten(d, a, b, rho, iwave):
    """Spherical-earth to flat-earth transform (surfdisp96.f:486-553).

    Layer-midpoint velocity mapping; Biswas density mapping with
    exponent -5 (Love) or -2.275 (Rayleigh).  The halfspace slot uses a
    fictitious 1 km thickness for its midpoint, exactly as the
    reference (surfdisp96.f:519).  Zero-thickness padded slots keep
    zero thickness.
    """
    d_eff = d.at[-1].set(1.0)
    zb = jnp.cumsum(d_eff)            # bottom depth of each layer
    zt = zb - d_eff                   # top depth
    r0 = EARTH_R - zt
    r1 = EARTH_R - zb
    z0 = EARTH_R * jnp.log(EARTH_R / r0)
    z1 = EARTH_R * jnp.log(EARTH_R / r1)
    d_f = z1 - z0
    tmp = (EARTH_R + EARTH_R) / (r0 + r1)
    a_f = a * tmp
    b_f = b * tmp
    ex = -5.0 if iwave == 1 else -2.275
    rho_f = rho * tmp ** ex
    d_f = d_f.at[-1].set(0.0)
    return d_f, a_f, b_f, rho_f


def sphere_flatten_T(d, a, b, rho, iwave):
    """:func:`sphere_flatten` on transposed (NL, C) layer arrays
    (layer axis leading; cumsum and the halfspace slot ride axis 0)."""
    ones = jnp.ones_like(d[-1:])
    d_eff = jnp.concatenate([d[:-1], ones], axis=0)
    zb = jnp.cumsum(d_eff, axis=0)
    zt = zb - d_eff
    r0 = EARTH_R - zt
    r1 = EARTH_R - zb
    z0 = EARTH_R * jnp.log(EARTH_R / r0)
    z1 = EARTH_R * jnp.log(EARTH_R / r1)
    d_f = z1 - z0
    tmp = (EARTH_R + EARTH_R) / (r0 + r1)
    a_f = a * tmp
    b_f = b * tmp
    ex = -5.0 if iwave == 1 else -2.275
    rho_f = rho * tmp ** ex
    d_f = jnp.concatenate([d_f[:-1], jnp.zeros_like(d_f[-1:])],
                          axis=0)
    return d_f, a_f, b_f, rho_f


# --------------------------------------------------------------------------
# period-parallel root search
# --------------------------------------------------------------------------

def _find_brackets(omega, cm, betmx, secular, mode, K, nblocks, dtype,
                   found0=None, lo0=None):
    """Locate the ``mode``-th sign change of ``secular`` in c for every
    period simultaneously.

    Walks blocks of K grid points (step DDC) upward from ``cm`` —
    the reference's guaranteed lower bound for the fundamental
    (surfdisp96.f:140-217) — counting sign changes; the m-th change
    brackets the m-th mode.  Returns (lo, found): bracket lower edges
    (width DDC) and success flags, both shaped like ``omega``.

    ``found0``/``lo0`` seed already-bracketed lanes (warm start); when
    every lane is seeded the while loop exits after one condition
    check.
    """
    P = omega.shape
    dc = jnp.asarray(DDC, dtype)
    koff = (jnp.arange(1, K + 1, dtype=dtype)) * dc  # (K,)

    sign0 = secular(omega / cm, omega) > 0           # (P,)

    def cond(st):
        j, _, _, found, _ = st
        base = cm + (j * K) * dc
        dead = base > betmx + dc
        return (j < nblocks) & jnp.logical_not(jnp.all(found | dead))

    def body(st):
        j, prev_sign, cnt, found, lo = st
        base = cm + (j * K) * dc
        c = base + koff                               # (K,)
        valid = c <= betmx + dc                       # (K,)
        sg = secular(omega[..., None] / c, omega[..., None]) > 0
        allsg = jnp.concatenate([prev_sign[..., None], sg], axis=-1)
        flips = (allsg[..., 1:] != allsg[..., :-1]) & valid
        cum = cnt[..., None] + jnp.cumsum(flips, axis=-1,
                                          dtype=jnp.int32)
        hit = (cum == mode) & flips                   # (P, K)
        has_hit = jnp.any(hit, axis=-1)
        idx = jnp.argmax(hit, axis=-1)                # first hit
        lo_new = base + idx * dc                      # c[idx] - dc
        newly = has_hit & jnp.logical_not(found)
        lo = jnp.where(newly, lo_new, lo)
        found = found | newly
        cnt = cum[..., -1]
        return (j + 1, sg[..., -1], cnt, found, lo)

    if found0 is None:
        found0 = jnp.zeros(P, bool)
        lo0 = jnp.full(P, cm, dtype)
    st0 = (jnp.asarray(0), sign0, jnp.zeros(P, jnp.int32), found0,
           jnp.broadcast_to(lo0, P))
    _, _, _, found, lo = lax.while_loop(cond, body, st0)
    return lo, found


def _ring_brackets(omega, c_prev, cm, betmx, secular, K, max_trips,
                   dtype):
    """Bracket the sign change NEAREST to a previous solution
    ``c_prev`` by searching expanding rings of K grid points (step
    DDC) on each side.

    McMC proposals perturb the model slightly, so the new root almost
    always lies within the first ring — one vector evaluation replaces
    the full upward walk.  Lanes that miss keep expanding outward; the
    search only degenerates to a full-range sweep for pathological
    moves, and a vmapped batch only pays extra trips when some chain
    actually needs them (unlike a full-restart fallback, which the
    whole batch would pay for whenever ANY lane misses — the miss
    probability of any fixed window approaches 1 as chains x periods
    grows).

    The secular kernel is VPU-compute-bound but carries a fixed
    per-invocation cost, so the center-point sign (needed to detect
    flips) is FUSED into the first trip's point set instead of being
    a separate kernel call — the extra lane per period pads into the
    same 128-lane tile, making the fusion free.

    Tracking the nearest root follows the reference's own warm-start
    semantics (``getsol`` walks from just below the previous period's
    root with a direction guard, surfdisp96.f:390-447); for the
    fundamental mode the nearest sign change IS the fundamental, since
    no roots exist below it.  Returns (lo, found).
    """
    P = omega.shape
    dc = jnp.asarray(DDC, dtype)
    ksteps = jnp.arange(1, K + 1, dtype=dtype) * dc   # (K,)

    def cond(st):
        t, _, _, found, dead, _ = st
        return (t < max_trips) & jnp.logical_not(jnp.all(found | dead))

    def body(st):
        t, sL, sR, found, dead, lo = st
        base = (t * K) * dc
        ptsR = c_prev[..., None] + base + ksteps      # (P, K) ascending
        ptsL = c_prev[..., None] - base - ksteps      # (P, K) descending

        validR = ptsR <= betmx + dc
        validL = ptsL >= cm
        # c_prev rides along in every trip: on trip 0 its sign seeds
        # the flip chains (sL/sR enter the loop unknown); afterwards
        # it is dead weight that pads into the same kernel tile
        pts = jnp.concatenate([c_prev[..., None], ptsR, ptsL],
                              axis=-1)
        sg = secular(omega[..., None] / pts, omega[..., None]) > 0
        s0 = sg[..., 0]
        sgR, sgL = sg[..., 1:K + 1], sg[..., K + 1:]
        first = t == 0
        sR_c = jnp.where(first, s0, sR)
        sL_c = jnp.where(first, s0, sL)

        allR = jnp.concatenate([sR_c[..., None], sgR], axis=-1)
        flipR = (allR[..., 1:] != allR[..., :-1]) & validR
        allL = jnp.concatenate([sL_c[..., None], sgL], axis=-1)
        flipL = (allL[..., 1:] != allL[..., :-1]) & validL

        jR = jnp.argmax(flipR, axis=-1)
        jL = jnp.argmax(flipL, axis=-1)
        hasR = jnp.any(flipR, axis=-1)
        hasL = jnp.any(flipL, axis=-1)
        # bracket lower edges: right flip j -> [pt_j - dc, pt_j];
        # left flip j -> [pt_j, pt_j + dc]
        loR = jnp.take_along_axis(ptsR, jR[..., None],
                                  axis=-1)[..., 0] - dc
        loL = jnp.take_along_axis(ptsL, jL[..., None], axis=-1)[..., 0]
        # prefer the nearer side; ties go up (reference walks upward)
        useL = hasL & (jnp.logical_not(hasR) | (jL < jR))
        lo_new = jnp.where(useL, loL, loR)
        newly = (hasR | hasL) & jnp.logical_not(found)
        lo = jnp.where(newly, lo_new, lo)
        found = found | newly

        dead = dead | (jnp.logical_not(validR[..., 0])
                       & jnp.logical_not(validL[..., 0]))
        # frontier signs advance only while in range
        sR = jnp.where(validR[..., -1], sgR[..., -1], sR_c)
        sL = jnp.where(validL[..., -1], sgL[..., -1], sL_c)
        return (t + 1, sL, sR, found, dead, lo)

    sfalse = jnp.zeros(P, bool)
    st0 = (jnp.asarray(0), sfalse, sfalse, jnp.zeros(P, bool),
           jnp.zeros(P, bool), jnp.full(P, cm, dtype))
    _, _, _, found, _, lo = lax.while_loop(cond, body, st0)
    return lo, found


def _ksection_refine(omega, lo, secular, KR, niter, dtype,
                     return_slope=False):
    """Narrow a (lo, lo+DDC) bracket by (KR+1)^niter via simultaneous
    evaluation of KR+1 grid points per iteration (the wide-vector
    replacement of the reference's ``nevill`` serial refinement),
    then polish with one secant step on the final bracket's secular
    VALUES — they come out of the same kernel calls for free.

    The renormalized secular value is continuous in c (the per-layer
    norms are maxima of continuous functions), so secant inside a
    sign-confirmed bracket converges quadratically in the typical
    smooth case and is safely clamped to the bracket otherwise —
    the pure-sign resolution DDC/(KR+1)^niter stays the worst-case
    guarantee.
    """
    dc = jnp.asarray(DDC, dtype)
    hi = lo + dc
    # fracs 0..1 inclusive: the bracket bottom (frac 0) rides along in
    # the SAME kernel call as the KR interior points and the top —
    # its value supplies the flip-direction sign and the secant's
    # f_lo, eliminating the separate f_lo kernel invocation (the
    # extra lane per period pads into the same 128-lane tile)
    fracs = jnp.arange(0, KR + 2, dtype=dtype) / (KR + 1)  # (KR+2,)

    def body(_, st):
        lo_c, hi_c, f_lo_c, f_hi_c = st
        pts = lo_c[..., None] + (hi_c - lo_c)[..., None] * fracs
        vals = secular(omega[..., None] / pts, omega[..., None])
        s_lo = vals[..., 0] > 0
        diff = (vals[..., 1:] > 0) != s_lo[..., None]  # (P, KR+1)
        idx = jnp.argmax(diff, axis=-1)               # first flip
        # no flip found (all same sign, can happen on a degenerate
        # bracket): keep the top point so the bracket stays put
        idx = jnp.where(jnp.any(diff, axis=-1), idx, KR)
        hi_n = jnp.take_along_axis(pts[..., 1:], idx[..., None],
                                   axis=-1)[..., 0]
        f_hi_n = jnp.take_along_axis(vals[..., 1:], idx[..., None],
                                     axis=-1)[..., 0]
        # new-lo candidates are fracs 0..KR (the point below each flip)
        lo_n = jnp.take_along_axis(pts[..., :-1], idx[..., None],
                                   axis=-1)[..., 0]
        f_lo_n = jnp.take_along_axis(vals[..., :-1], idx[..., None],
                                     axis=-1)[..., 0]
        return lo_n, hi_n, f_lo_n, f_hi_n

    zero_f = jnp.zeros(jnp.broadcast_shapes(lo.shape, omega.shape),
                       dtype)
    st0 = (lo, hi, zero_f, zero_f)
    lo, hi, f_lo, f_hi = lax.fori_loop(0, niter, body, st0)

    denom = f_hi - f_lo
    denom = jnp.where(denom == 0.0, 1.0, denom)
    c = lo - f_lo * (hi - lo) / denom
    # out-of-bracket fallback: with opposite-sign endpoint values the
    # secant is mathematically interior, so falling outside means an
    # endpoint value is (numerically) zero — i.e. an endpoint IS the
    # root (the Newton-recentered dim warm starts land there).  The
    # midpoint would re-introduce a width/2 systematic error; return
    # the smaller-|f| endpoint instead.
    edge = jnp.where(jnp.abs(f_lo) <= jnp.abs(f_hi), lo, hi)
    good = (c > lo) & (c < hi) & jnp.isfinite(c)
    c = jnp.where(good, c, edge)
    if return_slope:
        # the final bracket's secular slope — free from values already
        # in hand; cached to seed the next warm solve's Newton
        # recentering (see pallas_walk slope_prev)
        width = hi - lo
        slope = (f_hi - f_lo) / jnp.where(width == 0.0, 1.0, width)
        return c, slope
    return c


# --------------------------------------------------------------------------
# batch-first driver (chains as a native leading axis)
#
# The vmap-per-chain path maps each chain to a (1, L) pallas grid
# block, wasting 7/8 of the VPU sublanes; here the whole chain batch
# reaches the pallas secular kernel as (C, L) tiles.  Used by the
# sampler's hot path for Rayleigh f32 solves (the dominant cost is
# the ring walk on birth/death moves).
# --------------------------------------------------------------------------

def _find_brackets_b(omega, cm, betmx, secular, mode, K, nblocks,
                     dtype, found0=None, lo0=None):
    """Batched :func:`_find_brackets`: omega (C, R), cm/betmx (C, 1);
    ``secular`` maps (C, R[, K]) wvno/omega to same-shape values."""
    P = omega.shape
    dc = jnp.asarray(DDC, dtype)
    koff = (jnp.arange(1, K + 1, dtype=dtype)) * dc  # (K,)

    sign0 = secular(omega / cm, omega) > 0           # (C, R)

    def cond(st):
        j, _, _, found, _ = st
        base = cm + (j * K) * dc                     # (C, 1)
        dead = base > betmx + dc
        return (j < nblocks) & jnp.logical_not(jnp.all(found | dead))

    def body(st):
        j, prev_sign, cnt, found, lo = st
        base = cm + (j * K) * dc                     # (C, 1)
        c = base[..., None] + koff                   # (C, 1, K)
        valid = c <= betmx[..., None] + dc           # (C, 1, K)
        sg = secular(omega[..., None] / c, omega[..., None]) > 0
        allsg = jnp.concatenate(
            [prev_sign[..., None], sg], axis=-1)
        flips = (allsg[..., 1:] != allsg[..., :-1]) & valid
        cum = cnt[..., None] + jnp.cumsum(flips, axis=-1,
                                          dtype=jnp.int32)
        hit = (cum == mode) & flips                  # (C, R, K)
        has_hit = jnp.any(hit, axis=-1)
        idx = jnp.argmax(hit, axis=-1)               # (C, R)
        lo_new = base + idx * dc
        newly = has_hit & jnp.logical_not(found)
        lo = jnp.where(newly, lo_new, lo)
        found = found | newly
        cnt = cum[..., -1]
        return (j + 1, sg[..., -1], cnt, found, lo)

    if found0 is None:
        found0 = jnp.zeros(P, bool)
        lo0 = jnp.broadcast_to(cm, P).astype(dtype)
    st0 = (jnp.asarray(0), sign0, jnp.zeros(P, jnp.int32), found0,
           jnp.broadcast_to(lo0, P))
    _, _, _, found, lo = lax.while_loop(cond, body, st0)
    return lo, found


def _ring_brackets_b(omega, c_prev, cm, betmx, secular, K, max_trips,
                     dtype):
    """Batched :func:`_ring_brackets`: omega/c_prev (C, R),
    cm/betmx (C, 1).  As there, the center-point sign is fused into
    the first trip's kernel call (one secular invocation per trip)."""
    P = omega.shape
    dc = jnp.asarray(DDC, dtype)
    ksteps = jnp.arange(1, K + 1, dtype=dtype) * dc   # (K,)

    def cond(st):
        t, _, _, found, dead, _ = st
        return (t < max_trips) & jnp.logical_not(jnp.all(found | dead))

    def body(st):
        t, sL, sR, found, dead, lo = st
        base = (t * K) * dc
        ptsR = c_prev[..., None] + base + ksteps      # (C, R, K)
        ptsL = c_prev[..., None] - base - ksteps

        validR = ptsR <= betmx[..., None] + dc
        validL = ptsL >= cm[..., None]
        pts = jnp.concatenate([c_prev[..., None], ptsR, ptsL],
                              axis=-1)
        sg = secular(omega[..., None] / pts, omega[..., None]) > 0
        s0 = sg[..., 0]
        sgR, sgL = sg[..., 1:K + 1], sg[..., K + 1:]
        first = t == 0
        sR_c = jnp.where(first, s0, sR)
        sL_c = jnp.where(first, s0, sL)

        allR = jnp.concatenate([sR_c[..., None], sgR], axis=-1)
        flipR = (allR[..., 1:] != allR[..., :-1]) & validR
        allL = jnp.concatenate([sL_c[..., None], sgL], axis=-1)
        flipL = (allL[..., 1:] != allL[..., :-1]) & validL

        jR = jnp.argmax(flipR, axis=-1)
        jL = jnp.argmax(flipL, axis=-1)
        hasR = jnp.any(flipR, axis=-1)
        hasL = jnp.any(flipL, axis=-1)
        loR = jnp.take_along_axis(ptsR, jR[..., None],
                                  axis=-1)[..., 0] - dc
        loL = jnp.take_along_axis(ptsL, jL[..., None], axis=-1)[..., 0]
        useL = hasL & (jnp.logical_not(hasR) | (jL < jR))
        lo_new = jnp.where(useL, loL, loR)
        newly = (hasR | hasL) & jnp.logical_not(found)
        lo = jnp.where(newly, lo_new, lo)
        found = found | newly

        dead = dead | (jnp.logical_not(validR[..., 0])
                       & jnp.logical_not(validL[..., 0]))
        sR = jnp.where(validR[..., -1], sgR[..., -1], sR_c)
        sL = jnp.where(validL[..., -1], sgL[..., -1], sL_c)
        return (t + 1, sL, sR, found, dead, lo)

    sfalse = jnp.zeros(P, bool)
    st0 = (jnp.asarray(0), sfalse, sfalse, jnp.zeros(P, bool),
           jnp.zeros(P, bool),
           jnp.broadcast_to(cm, P).astype(dtype))
    _, _, _, found, _, lo = lax.while_loop(cond, body, st0)
    return lo, found


def surfdisp_roots_batch_grouped(h, vp, vs, rho, periods_list, igrs,
                                 c_prevs=None, iwave=2, mode=1,
                                 iflsph=0, kblock=64, nblocks=16,
                                 krefine=15, nrefine=None,
                                 warm_halfwidth=16,
                                 anchor_warm=False,
                                 anchor_halfwidth=64,
                                 warm_trips_cap=None,
                                 anchor_trips_cap=3,
                                 pert_newton=False, slope_prevs=None,
                                 return_slopes=False,
                                 interpret=False):
    """Solve SEVERAL same-wave-type dispersion targets of one model
    batch in shared kernel calls.

    The secular kernel is VPU-compute-bound with a significant fixed
    per-invocation cost (see _ring_brackets), so targets sharing the
    same wave type (e.g. Rayleigh phase + Rayleigh group of a joint
    inversion) concatenate their phase-velocity lanes and ride the
    same bracketing/refinement calls — halving the kernel-call count
    of a multi-SWD-target sampling step.

    ``periods_list`` per-target period arrays; ``igrs`` matching
    tuple of igr flags; ``c_prevs`` matching list of warm roots
    ``(C, R_i)`` (``R_i = nper`` for phase, ``2*nper`` for group
    targets), or None for a cold counting search shared by all.

    The dimension-move recentering inside a grouped WARM solve is the
    per-lane Newton prepass (the 2-lane anchor-ring prepass is only
    available ungrouped); refinement runs the max pass count any
    member needs — a group-velocity member lifts phase members to 3
    passes, strictly more accurate.

    Returns a list of ``(cg, err, roots)`` per target.
    """
    outs = _roots_batch_impl(h, vp, vs, rho, tuple(periods_list),
                             tuple(igrs), c_prevs,
                             iwave=iwave, mode=mode, iflsph=iflsph,
                             kblock=kblock, nblocks=nblocks,
                             krefine=krefine, nrefine=nrefine,
                             warm_halfwidth=warm_halfwidth,
                             anchor_warm=anchor_warm,
                             anchor_halfwidth=anchor_halfwidth,
                             warm_trips_cap=warm_trips_cap,
                             anchor_trips_cap=anchor_trips_cap,
                             pert_newton=pert_newton,
                             slope_prevs=slope_prevs,
                             interpret=interpret)
    return outs if return_slopes else [o[:3] for o in outs]


def surfdisp_roots_batch(h, vp, vs, rho, periods, c_prev=None,
                         iwave=2, mode=1, igr=0, iflsph=0, kblock=64,
                         nblocks=16, krefine=15, nrefine=None,
                         warm_halfwidth=16, anchor_warm=False,
                         anchor_halfwidth=64, warm_trips_cap=None,
                         anchor_trips_cap=3, pert_newton=False,
                         slope_prev=None,
                         return_slopes=False, layout_t=False,
                         prep=None, interpret=False):
    """Batch-first :func:`surfdisp_roots`: layer arrays (C, NL),
    ``c_prev`` (C, R); returns (cg (C, P), err (C,), roots (C, R))
    — plus the roots' bracket slopes (C, R) when ``return_slopes``.
    ``slope_prev`` optionally carries the previous solve's slopes to
    seed the Newton recentering with one secular sweep instead of
    two (see pallas_walk); ``exp_prev`` its exponents, which rescale
    cached slopes across a dimension jump (required for the
    dimension-move slope cache).

    f32 only (the sampler hot path); the secular function (Rayleigh
    ``dltar4`` or Love ``dltar1``) runs in the pallas VMEM kernel with
    chains tiled 8 per program.

    ``anchor_warm`` recenters the warm ring for dimension moves
    (birth/death), whose roots jump much further than perturbation
    moves: the shortest- and longest-period lanes are ring-searched
    first as a cheap 2-lane pre-pass, the per-chain root shift is
    linearly interpolated across periods, and the main ring starts
    from the recentered estimates — lanes then exit in ~1 trip
    instead of walking the full jump distance at every period.  The
    search semantics (nearest sign change, expand on miss) are
    unchanged, so results are identical whenever both searches lock
    onto the same root.

    ``warm_trips_cap`` bounds the warm-ring walk: lanes whose root
    lies beyond cap*warm_halfwidth*DDC of the (recentered) start are
    reported unfound, which the evaluator maps to the sentinel
    likelihood and the proposal is rejected.  The root-shift
    distribution under McMC moves is extremely heavy-tailed (median
    <1 DDC step, p99 ~200 steps measured on death proposals), and a
    monolithic batched ring pays the batch-max walk on every step;
    a capped lane implies the proposal moved the dispersion curve
    >~0.2 km/s somewhere, hopeless against posterior noise levels
    (sigma ~0.01-0.05 km/s), so rejecting it outright changes the
    chain statistics immeasurably while removing the tail cost.
    This mirrors the reference solver's own state-dependent failure
    mode (getsol search failure -> err -> rejected proposal,
    surfdisp96.f:429-447, src/surf96_modsw.py:119-126).
    """
    out = _roots_batch_impl(
        h, vp, vs, rho, (periods,), (igr,),
        None if c_prev is None else [c_prev],
        iwave=iwave, mode=mode, iflsph=iflsph, kblock=kblock,
        nblocks=nblocks, krefine=krefine, nrefine=nrefine,
        warm_halfwidth=warm_halfwidth, anchor_warm=anchor_warm,
        anchor_halfwidth=anchor_halfwidth,
        warm_trips_cap=warm_trips_cap,
        anchor_trips_cap=anchor_trips_cap, pert_newton=pert_newton,
        slope_prevs=None if slope_prev is None else [slope_prev],
        layout_t=layout_t, prep=prep, interpret=interpret)
    return out[0] if return_slopes else out[0][:3]


def t_walker_ok(n_lanes, have_cprev, anchor_warm, dtype):
    """True when the transposed-layout fast path (fused walker with
    in-kernel Newton prepass) will run for a solve of ``n_lanes``
    total period lanes — the gate shared by :func:`_roots_batch_impl`
    and the evaluator's model-kernel dispatch (the unified prep
    operands are only consumable by the walker path)."""
    return (have_cprev
            and os.environ.get('BAYHUNTER_WARM_SOLVER',
                               'walk') == 'walk'
            and dtype == jnp.float32 and n_lanes <= 128
            and os.environ.get('BAYHUNTER_WALK_NEWTON', '1') == '1'
            and os.environ.get('BAYHUNTER_WALK_COMPACT', '1') == '1'
            and (not anchor_warm
                 or os.environ.get('BAYHUNTER_DIM_PREPASS',
                                   'newton') == 'newton'))


def _roots_batch_impl(h, vp, vs, rho, periods_list, igrs, c_prevs,
                      iwave=2, mode=1, iflsph=0, kblock=64,
                      nblocks=16, krefine=15, nrefine=None,
                      warm_halfwidth=16, anchor_warm=False,
                      anchor_halfwidth=64, warm_trips_cap=None,
                      anchor_trips_cap=3, pert_newton=False,
                      slope_prevs=None,
                      layout_t=False, prep=None, interpret=False):
    """Shared body of surfdisp_roots_batch{,_grouped}: one bracketing
    + refinement pipeline over the concatenation of every target's
    phase-velocity lanes.

    ``layout_t``: the layer arrays arrive TRANSPOSED (NL, C) — the
    chains-on-lanes step pipeline.  Supported end-to-end only on the
    production warm path (walker + in-kernel Newton); any other
    configuration transposes back up front and runs the row-major
    code (correctness fallback, 4 relayout copies)."""
    from bayhunter_tpu.ops.pallas_secular import (dltar1_pallas,
                                                  dltar4_pallas)

    dtype = prep[0].dtype if prep is not None else h.dtype
    ngroups = len(periods_list)
    if layout_t:
        # the T fast path needs the fused walker with its in-kernel
        # prepass — every other arm dispatches XLA-level secular
        # calls that read (C, NL) layer rows
        n_lanes = sum((2 if g > 0 else 1) * int(p.shape[0])
                      for p, g in zip(periods_list, igrs))
        walker_ok = t_walker_ok(n_lanes, c_prevs is not None,
                                anchor_warm, dtype)
        if not walker_ok:
            if prep is not None:
                raise ValueError(
                    'model-kernel prep operands supplied but the '
                    'transposed walker path is not active (caller '
                    'gating must mirror t_walker_ok)')
            h, vp, vs, rho = (x.T for x in (h, vp, vs, rho))
            layout_t = False
    elif prep is not None:
        raise ValueError('prep operands require layout_t')
    C = prep[0].shape[1] if prep is not None \
        else (h.shape[1] if layout_t else h.shape[0])
    if nrefine is None:
        # the closing secant polish makes one sign pass (bracket
        # dc/16) sufficient for phase solves; group solves difference
        # two phase solves 1% apart, amplifying worst-case bracket
        # error ~100x, so they keep the pure-sign dc/16^3 guarantee —
        # and lift every member of a shared solve with them
        nrefine = 3 if (dtype == jnp.float64 or any(igrs)) \
            else (NREFINE_F32 or 1)

    if prep is not None:
        # unified model-kernel operands (ops/pallas_prep.py
        # model_operands_t): the flattening, cm/betmx and the walker
        # prop stack were all computed in-kernel.  The individual
        # planes are LAZY slices of the stacked props (dead code
        # unless a non-walker consumer needs them; Love stacks carry
        # no vp plane, so ``a`` stays unbound there).
        props_flat, cm_row, bx_row, top_chain = prep
        n_props = 3 if iwave == 1 else 4
        nl_k = props_flat.shape[0] // n_props
        d = props_flat[:nl_k]
        if iwave == 1:
            a = None
            b = props_flat[nl_k:2 * nl_k]
            rho_w = props_flat[2 * nl_k:]
        else:
            a = props_flat[nl_k:2 * nl_k]
            b = props_flat[2 * nl_k:3 * nl_k]
            rho_w = props_flat[3 * nl_k:]
    elif iflsph == 1:
        if layout_t:
            d, a, b, rho_w = sphere_flatten_T(h, vp, vs, rho, iwave)
        else:
            d, a, b, rho_w = jax.vmap(
                lambda hh, aa, bb, rr: sphere_flatten(hh, aa, bb, rr,
                                                      iwave))(h, vp,
                                                              vs, rho)
    else:
        d, a, b, rho_w = h, vp, vs, rho

    # per-chain lower bound cm and maximum velocity (C, 1).  One-hot
    # reductions instead of take_along_axis: per-row dynamic gathers
    # lower to a TPU gather custom call with a fixed multi-ms cost at
    # 10k chains, while the masked sums fuse into elementwise ops.
    # The per-chain SCALAR tail (gtsolh's 5x~15-op Newton) then runs
    # on FLAT (C,) arrays behind an optimization barrier: (C, 1)
    # f32 tiles as T(8, 128) with 127/128 lanes dead, so the Newton
    # chain alone was ~0.1 ms/solve at 10,240 chains (profiled as the
    # largest single XLA-tail op of a production step) — flat 1-D
    # arrays tile full lanes, ~100x fewer vregs per op.  In the
    # transposed layout every op here is full-lane natively and no
    # barrier fences are needed at all.
    if prep is not None:
        cm = cm_row.astype(dtype)[:, None]          # (C, 1)
        betmx = bx_row.astype(dtype)[:, None]
    elif layout_t:
        solid = b > 0.01                           # (NL, C)
        cand = jnp.where(solid, b, a)
        jmn = jnp.argmin(cand, axis=0)             # (C,)
        at_mn = (jnp.arange(cand.shape[0])[:, None]
                 == jmn[None, :])
        zero = jnp.zeros((), cand.dtype)

        def _pick(x):
            return jnp.sum(jnp.where(at_mn, x, zero), axis=0)

        betmn, a_mn, b_mn = _pick(cand), _pick(a), _pick(b)
        jsol = jnp.any(at_mn & solid, axis=0)
        cc1 = jnp.where(jsol, gtsolh(a_mn, b_mn), betmn)
        cm = (0.95 * 0.90 * cc1).astype(dtype)[:, None]
        betmx = jnp.max(b, axis=0)[:, None]
    else:
        solid = b > 0.01
        cand = jnp.where(solid, b, a)
        jmn = jnp.argmin(cand, axis=-1, keepdims=True)
        at_mn = jnp.arange(cand.shape[-1])[None, :] == jmn
        zero = jnp.zeros((), cand.dtype)

        def _pick(x):
            return jnp.sum(jnp.where(at_mn, x, zero), axis=-1)  # (C,)

        betmn, a_mn, b_mn, jsol = jax.lax.optimization_barrier(
            (_pick(cand), _pick(a), _pick(b),
             jnp.any(at_mn & solid, axis=-1).astype(cand.dtype)))
        cc1 = jnp.where(jsol > 0.5, gtsolh(a_mn, b_mn), betmn)
        cm = jax.lax.optimization_barrier(
            (0.95 * 0.90 * cc1).astype(dtype))[:, None]   # (C, 1)
        betmx = jnp.max(b, axis=-1, keepdims=True)

    def secular(wvno, omega):
        shape = wvno.shape                            # (C, ...)
        n0 = int(np.prod(shape[1:]))
        L = max(128, -(-n0 // 128) * 128)
        wv = jnp.reshape(
            jnp.broadcast_to(wvno, shape), (C, n0))
        om = jnp.reshape(jnp.broadcast_to(omega, shape), (C, n0))
        if L != n0:
            pad = L - n0
            wv = jnp.concatenate(
                [wv, jnp.broadcast_to(wv[:, :1], (C, pad))], axis=1)
            om = jnp.concatenate(
                [om, jnp.broadcast_to(om[:, :1], (C, pad))], axis=1)
        if iwave == 1:
            vals = dltar1_pallas(wv, om, d, b, rho_w,
                                 interpret=interpret)
        else:
            vals = dltar4_pallas(wv, om, d, a, b, rho_w,
                                 interpret=interpret)
        return vals[:, :n0].reshape(shape)

    # per-target lane segments: a phase target contributes R lanes, a
    # group target 2R (the t/(1±h) half-solves); slices are static
    t_list, t1_list, om_segs, slices = [], [], [], []
    off = 0
    for t_raw, igr_t in zip(periods_list, igrs):
        t_l = t_raw.astype(dtype)
        t_list.append(t_l)
        if igr_t > 0:
            t1a = t_l / (1.0 + HGR)
            t1b = t_l / (1.0 - HGR)
            t1_list.append((t1a, t1b))
            om = TWOPI / jnp.concatenate([t1a, t1b])
        else:
            t1_list.append(None)
            om = TWOPI / t_l
        om_segs.append(om)
        slices.append((off, off + om.shape[0]))
        off += om.shape[0]
    omegas = jnp.broadcast_to(
        om_segs[0] if ngroups == 1 else jnp.concatenate(om_segs),
        (C, off))

    if c_prevs is not None:
        c_prev = c_prevs[0] if ngroups == 1 \
            else jnp.concatenate([cpv for cpv in c_prevs], axis=-1)
        cp = jnp.clip(c_prev.astype(dtype), cm, betmx)
        prepass = os.environ.get('BAYHUNTER_DIM_PREPASS', 'newton')
        # Newton recentering on perturbation-move warm solves: the
        # caller chooses per move type (``pert_newton`` — the sampler
        # enables it for vs and vp/vs moves, whose root shifts reach
        # tens of DDC steps, and not for z moves, whose shifts are
        # sub-DDC and for whom the recentering call is pure overhead:
        # measured @10240 chains vs 14.3 -> 10.9 ms/step,
        # vpvs 11.1 -> 10.1, z 9.2 -> 10.2).  The env var forces the
        # choice globally for A/B: 'newton' -> always, '0' -> never.
        _pp_env = os.environ.get('BAYHUNTER_PERT_PREPASS', '')
        if _pp_env == 'newton':
            pert_newton = True
        elif _pp_env == '0':
            pert_newton = False
        pert_newton = (not anchor_warm) and pert_newton
        use_walker = (os.environ.get('BAYHUNTER_WARM_SOLVER',
                                     'walk') == 'walk'
                      and dtype == jnp.float32
                      and omegas.shape[1] <= 128)
        # when the walker runs, it performs the Newton recentering
        # IN-KERNEL (pallas_walk newton_iters) — the XLA-level
        # prepass pays two dispatched secular calls whose live lanes
        # pad 42 -> 128, while the walker's lanes are already packed
        # densely.  BAYHUNTER_WALK_NEWTON=0 restores the XLA prepass
        # for A/B.
        walk_newton = use_walker and os.environ.get(
            'BAYHUNTER_WALK_NEWTON', '1') == '1'
        walk_newton_iters = 0
        if (anchor_warm and prepass == 'newton') or pert_newton:
            # Newton recentering: secular value AND slope at c_prev
            # from the same kernel call (the per-layer
            # renormalization scale is arbitrary but IDENTICAL within
            # one call, so their ratio is scale-free).  Valid where
            # the secular function is locally smooth — the common
            # case; overshooting lanes miss the main ring and fall
            # into the existing cap-reject path.  PRODUCTION DEFAULT:
            # +11% end-to-end vs the 2-lane anchor ring
            # (BAYHUNTER_DIM_PREPASS=anchor restores it), posterior
            # identical at reference scale (VALIDATION.md newton row)
            # at a higher dim cap-reject rate (9.8% vs 6.0% measured
            # mid-burn-in) — the same immaterial failure class the
            # nocap A/B bounds.
            #
            # ITERATED (BAYHUNTER_DIM_NEWTON_ITERS, dim moves only):
            # measured on real birth/death proposals at reference
            # shapes, a second iteration collapses the reachable
            # lanes' residual start error to ~0 (birth p99 0.13 DDC,
            # death p90 0.02 — vs 6.0 / 2.3 after one pass), leaving
            # only lanes beyond the walk bound entirely (cap-rejects
            # either way).  That lets the dim walk bound shrink
            # without changing the reject class, which is where the
            # dim solve's cost lives: every unfound lane forces its
            # whole block to walk to the bound.
            n_newton = max(1, int(os.environ.get(
                'BAYHUNTER_DIM_NEWTON_ITERS', '2'))) \
                if anchor_warm else 1
            maxshift = 3.0 * anchor_halfwidth * DDC
            if walk_newton:
                walk_newton_iters = n_newton
            else:
                # mirrors the in-kernel schedule (pallas_walk):
                # iteration 1 = value + FD slope, follow-ups = secant
                # across the actual previous step (one point each)
                eps = jnp.asarray(DDC / 16.0, dtype)
                pts = jnp.stack([cp, cp + eps], axis=-1)  # (C, R, 2)
                vals = secular(omegas[..., None] / pts,
                               omegas[..., None])
                slope = (vals[..., 1] - vals[..., 0]) / eps
                slope = jnp.where(slope == 0.0, 1.0, slope)
                shift = jnp.clip(-vals[..., 0] / slope,
                                 -maxshift, maxshift)
                cp_pv, v_pv = cp, vals[..., 0]
                cp = jnp.clip(cp + shift, cm, betmx)
                use_secant = os.environ.get(
                    'BAYHUNTER_NEWTON_SECANT', '1') == '1'
                for _ in range(n_newton - 1):
                    if use_secant:
                        v0 = secular(omegas / cp, omegas)
                        step = cp - cp_pv
                        sec = (v0 - v_pv) / jnp.where(
                            step == 0.0, 1.0, step)
                        slope = jnp.where(jnp.abs(step) > eps, sec,
                                          slope)
                    else:
                        pts = jnp.stack([cp, cp + eps], axis=-1)
                        vals = secular(omegas[..., None] / pts,
                                       omegas[..., None])
                        v0 = vals[..., 0]
                        slope = (vals[..., 1] - v0) / eps
                    slope = jnp.where(slope == 0.0, 1.0, slope)
                    shift = jnp.clip(-v0 / slope, -maxshift,
                                     maxshift)
                    cp_pv, v_pv = cp, v0
                    cp = jnp.clip(cp + shift, cm, betmx)
        elif anchor_warm:
            if ngroups != 1:
                raise ValueError(
                    'the anchor-ring prepass supports only ungrouped '
                    'solves; grouped dimension-move solves use the '
                    'newton prepass')
            t = t_list[0]
            nper_l = t.shape[0]
            R = omegas.shape[1]
            anc = np.array([0, nper_l - 1], np.int32)
            om_anc = omegas[:, anc]
            cp_anc = cp[:, anc]
            # env overrides for same-session (width x trips) A/B
            anchor_halfwidth = int(os.environ.get(
                'BAYHUNTER_ANCHOR_RING', str(anchor_halfwidth)))
            anchor_trips_cap = int(os.environ.get(
                'BAYHUNTER_ANCHOR_CAP', str(anchor_trips_cap or 0))) \
                or None
            trips_anc = max(1, (kblock * nblocks) // anchor_halfwidth)
            if anchor_trips_cap is not None:
                trips_anc = min(trips_anc, anchor_trips_cap)
            lo_anc, found_anc = _ring_brackets_b(
                om_anc, cp_anc, cm, betmx, secular, anchor_halfwidth,
                trips_anc, dtype)
            delta = jnp.where(found_anc, lo_anc - cp_anc, 0.0)
            # period-index interpolation; with igr the lane array is
            # the two t/(1±h) half-solves at (nearly) the same periods
            wgt = ((jnp.arange(R) % nper_l)
                   / max(nper_l - 1, 1)).astype(dtype)
            shift = delta[:, :1] * (1.0 - wgt) + delta[:, 1:2] * wgt
            cp = jnp.clip(cp + shift, cm, betmx)
        trips = max(1, (kblock * nblocks) // warm_halfwidth)
        if warm_trips_cap is not None:
            trips = min(trips, warm_trips_cap)
        # The fused walking kernel replaces the staged ring +
        # k-section pipeline — one pallas call whose lanes walk their
        # own nearest-first candidate sequence and bisect the found
        # bracket in VMEM (ops/pallas_walk.py; same search semantics
        # and DDC/16^n refinement guarantee, sub-bracket selection
        # may differ when a DDC cell holds multiple sign changes).
        # PRODUCTION DEFAULT since the 2026-08-18 on-chip A/B:
        # 0.49 vs 1.73 ms per warm solve at bench shapes; end-to-end
        # 235.9k vs 174.2k proposals/s @512 and 367.1k (142.9x
        # baseline) @10240, posterior revalidated at reference scale.
        # BAYHUNTER_WARM_SOLVER=staged restores the ring pipeline
        # (also the automatic fallback for f64 and >128-lane solves).
        if use_walker:
            from bayhunter_tpu.ops.pallas_walk import warm_roots_walk
            # in-kernel bracket refinement depth.  The closing
            # secant is a FALSE-POSITION step, whose error scales
            # with the PRODUCT of the endpoint errors — so its
            # accuracy depends on whether the solve was
            # Newton-recentered:
            #   * RECENTERED solves (vs/vpvs pert_newton, dim
            #     anchor_warm newton) have a bracket endpoint
            #     sitting ~ON the root; the secant lands on it
            #     regardless of bracket width -> depth 0.  Measured
            #     at the production distribution vs the f64 native
            #     golden: depth 2/1/0 median 1.79/1.84/1.90e-7, p99
            #     1.4/1.8/3.7e-6 (scripts/calibrate_walk_nbisect.py
            #     NB_DEPTHS=2,1,0, and the
            #     test_walker_warm_refinement_error_bounded
            #     regression).  On-chip @10240: depth 4 -> 2 -> 1
            #     gave 1.498 -> 1.583 -> 1.692 M proposals/s
            #     (2026-08-19), 1 -> 0 gave 1.776 -> 1.835 M
            #     (2026-08-20); reject classes flat; reference-scale
            #     posterior revalidated (VALIDATION.md session-10).
            #   * UNRECENTERED solves (z moves — no prepass) see the
            #     full curvature of the raw DDC bracket: on LVZ
            #     pathology lanes the depth-0 secant missed by up to
            #     1.7e-3 km/s against the staged dc/16 refiner
            #     (test_grouped_solver_pathology_sweep, Love
            #     cross-solver parity) -> keep ONE bisection.
            #   * GROUP-velocity solves keep the full 4*nrefine:
            #     their t/(1±h) half-solve differencing amplifies
            #     bracket error ~100x (a recentered-start
            #     calibration shows depth-insensitivity — p99
            #     0.97/1.11/1.17/1.28e-4 at 12/4/2/0,
            #     scripts/calibrate_group_nbisect.py — but that is
            #     the endpoint-pinning effect; unrecentered grouped
            #     sweeps at depth 4 diverged ~2e-3).
            newton_recentered = ((anchor_warm and prepass == 'newton')
                                 or pert_newton)
            nbisect = int(os.environ.get(
                'BAYHUNTER_WALK_NBISECT',
                ('0' if newton_recentered else '1') if nrefine == 1
                else str(4 * nrefine)))
            # cached slopes seed the walker's Newton recentering —
            # perturbation moves only (same dimension, so the cached
            # slope is scale-compatible; the dimension-move exponent
            # rescale was built, adjudicated stale and DELETED — see
            # pallas_walk cached-slope note / docs/performance.md)
            sl_prev = None
            if slope_prevs is not None and walk_newton_iters > 0:
                sl_prev = slope_prevs[0] if ngroups == 1 \
                    else jnp.concatenate(list(slope_prevs), axis=-1)
                sl_prev = sl_prev.astype(dtype)
            c, found, slope = warm_roots_walk(
                d, a, b, rho_w, omegas, cp, cm, betmx, float(DDC),
                iwave=iwave, ring_k=warm_halfwidth, trips=trips,
                nbisect=nbisect,
                newton_iters=walk_newton_iters,
                newton_maxshift=3.0 * anchor_halfwidth * DDC,
                slope_prev=sl_prev,
                layout_t=layout_t,
                pstack=None if prep is None else props_flat,
                top_chain=None if prep is None else top_chain,
                interpret=interpret)
        else:
            lo, found = _ring_brackets_b(omegas, cp, cm, betmx,
                                         secular, warm_halfwidth,
                                         trips, dtype)
            c, slope = _ksection_refine(omegas, lo, secular, krefine,
                                        nrefine, dtype,
                                        return_slope=True)
            slope = jnp.where(found, slope, 0.0)
    else:
        lo, found = _find_brackets_b(omegas, cm, betmx, secular, mode,
                                     kblock, nblocks, dtype)
        c, slope = _ksection_refine(omegas, lo, secular, krefine,
                                    nrefine, dtype,
                                    return_slope=True)
        slope = jnp.where(found, slope, 0.0)

    outs = []
    for t_l, t1, (s0, s1), igr_t in zip(t_list, t1_list, slices,
                                        igrs):
        c_seg = c[:, s0:s1]
        found_seg = found[:, s0:s1]
        nper = t_l.shape[0]
        if igr_t > 0:
            t1a, t1b = t1
            ca, cb = c_seg[:, :nper], c_seg[:, nper:]
            ok = found_seg[:, :nper] & found_seg[:, nper:]
            out = ((1.0 / t1a - 1.0 / t1b)
                   / (1.0 / (t1a * ca) - 1.0 / (t1b * cb)))
        else:
            ok = found_seg
            out = c_seg

        failed_cum = jnp.cumsum(jnp.logical_not(ok), axis=-1) > 0
        cg = jnp.where(failed_cum, 0.0, out)
        err = jnp.any(jnp.logical_not(ok), axis=-1)
        outs.append((cg, err, c_seg, slope[:, s0:s1]))
    return outs


# --------------------------------------------------------------------------
# public driver
# --------------------------------------------------------------------------

def surfdisp_roots(h, vp, vs, rho, periods, c_prev=None, iwave=2,
                   mode=1, igr=0, iflsph=0, kblock=64, nblocks=16,
                   krefine=15, nrefine=None, warm_halfwidth=16,
                   warm_max_trips=None, return_slopes=False):
    """Like :func:`surfdisp` but also returns the refined
    phase-velocity roots for warm-starting a subsequent solve.

    ``c_prev`` (optional) carries the previous solve's roots — shape
    (P,) for phase targets and (2P,) for group targets (the two
    t/(1±h) solves).  Warm lanes bracket in one 2*warm_halfwidth+1
    point evaluation around ``c_prev``; missed lanes fall back to the
    full counting search.  Returns ``(cg, err, roots)``.
    """
    dtype = h.dtype
    if nrefine is None:
        # see surfdisp_roots_batch: secant polish carries phase solves
        nrefine = 3 if (dtype == jnp.float64 or igr > 0) \
            else (NREFINE_F32 or 1)

    if iflsph == 1:
        d, a, b, rho_w = sphere_flatten(h, vp, vs, rho, iwave)
    else:
        d, a, b, rho_w = h, vp, vs, rho

    water = b[0] <= 0.0

    # extremal velocities & lower bound cm (surfdisp96.f:140-217)
    solid = b > 0.01
    cand = jnp.where(solid, b, a)
    jmn = jnp.argmin(cand)
    betmn = cand[jmn]
    jsol = solid[jmn]
    betmx = jnp.max(b)

    cc1 = jnp.where(jsol, gtsolh(a[jmn], b[jmn]), betmn)
    cm = (0.95 * 0.90 * cc1).astype(dtype)

    def _pallas_secular_1d(kernel, *layers):
        """Lane-pad candidates to a 128 multiple and call a per-chain
        pallas secular kernel (shared Love/Rayleigh wrapper)."""
        def secular(wvno, omega):
            wvno_b, omega_b = jnp.broadcast_arrays(wvno, omega)
            shape = wvno_b.shape
            n0 = int(np.prod(shape)) if shape else 1
            L = max(128, -(-n0 // 128) * 128)
            wv = jnp.resize(wvno_b.reshape(-1), (L,))
            om = jnp.resize(omega_b.reshape(-1), (L,))
            vals = kernel(wv, om, *layers)
            return vals[:n0].reshape(shape)
        return secular

    if iwave == 1 and USE_PALLAS and dtype == jnp.float32:
        from bayhunter_tpu.ops.pallas_secular import \
            dltar1_pallas_single
        secular = _pallas_secular_1d(dltar1_pallas_single, d, b, rho_w)
    elif iwave == 1:
        def secular(wvno, omega):
            return dltar1(wvno, omega, d, a, b, rho_w, water)
    elif USE_PALLAS and dtype == jnp.float32:
        from bayhunter_tpu.ops.pallas_secular import \
            dltar4_pallas_single
        secular = _pallas_secular_1d(dltar4_pallas_single, d, a, b,
                                     rho_w)
    else:
        def secular(wvno, omega):
            return dltar4(wvno, omega, d, a, b, rho_w, water)

    t = periods.astype(dtype)
    if igr > 0:
        # two phase solves at t/(1±h) (surfdisp96.f:232-239)
        t1a = t / (1.0 + HGR)
        t1b = t / (1.0 - HGR)
        omegas = TWOPI / jnp.concatenate([t1a, t1b])
    else:
        omegas = TWOPI / t

    if c_prev is not None:
        # warm path: a few expanding rings around the previous roots
        # (small perturbations exit after ring 1), then the 64-wide
        # counting search ONLY for lanes whose root jumped far —
        # heavy-tailed under birth/death moves — where the wide walk
        # from cm is cheaper than a long ring expansion
        cp = jnp.clip(c_prev.astype(dtype), cm, betmx)
        if warm_max_trips is None:
            # pure ring: expand until the root is found or the range
            # is exhausted (measured fastest — a counting-search
            # fallback re-pays the full sweep whenever ANY lane in the
            # batch misses, which at large batches is every
            # birth/death iteration)
            trips = max(1, (kblock * nblocks) // warm_halfwidth)
            lo, found = _ring_brackets(omegas, cp, cm, betmx, secular,
                                       warm_halfwidth, trips, dtype)
        else:
            lo0, found0 = _ring_brackets(omegas, cp, cm, betmx,
                                         secular, warm_halfwidth,
                                         warm_max_trips, dtype)
            lo, found = _find_brackets(omegas, cm, betmx, secular,
                                       mode, kblock, nblocks, dtype,
                                       found0=found0, lo0=lo0)
    else:
        lo, found = _find_brackets(omegas, cm, betmx, secular, mode,
                                   kblock, nblocks, dtype)
    c, slope = _ksection_refine(omegas, lo, secular, krefine,
                                nrefine, dtype, return_slope=True)
    slope = jnp.where(found, slope, 0.0)

    nper = t.shape[0]
    if igr > 0:
        ca, cb = c[:nper], c[nper:]
        ok = found[:nper] & found[nper:]
        gvel = ((1.0 / t1a - 1.0 / t1b)
                / (1.0 / (t1a * ca) - 1.0 / (t1b * cb)))
        out = gvel
    else:
        ok = found
        out = c

    # zero-fill from the first failing period on (surfdisp96.f:313-354)
    failed_cum = jnp.cumsum(jnp.logical_not(ok)) > 0
    cg = jnp.where(failed_cum, 0.0, out)
    err = jnp.any(jnp.logical_not(ok))
    if return_slopes:
        return cg, err, c, slope
    return cg, err, c


@partial(jax.jit,
         static_argnames=('iwave', 'mode', 'igr', 'iflsph', 'kblock',
                          'nblocks', 'krefine', 'nrefine'))
def surfdisp(h, vp, vs, rho, periods, iwave=2, mode=1, igr=0, iflsph=0,
             kblock=64, nblocks=16, krefine=15, nrefine=None):
    """Dispersion curve for one padded layer model.

    Arguments mirror the reference entry point
    (surfdisp96.f:55-56 / src/surf96_modsw.py:84-126):

      h, vp, vs, rho : (NL,) padded layer arrays, halfspace last
      periods        : (P,) periods in s (monotone increasing)
      iwave          : 1 Love, 2 Rayleigh
      mode           : 1 fundamental, 2 first higher, ...
      igr            : 0 phase velocity, >0 group velocity
      iflsph         : 0 flat earth, 1 spherical (flattening applied)

    Tuning (static): ``kblock`` grid points per bracketing block,
    ``nblocks`` max blocks (kblock*nblocks*DDC must cover the root
    range — defaults span 5.1 km/s), ``krefine``/``nrefine`` K-section
    refinement width/iterations.

    Returns ``(cg, err)`` with ``cg`` shape (P,) phase/group velocities
    (zeros after the first failed period, as the reference) and ``err``
    True if any period failed (the reference plugin then returns NaN
    data; src/surf96_modsw.py:119-126).

    Batch with ``jax.vmap`` over the leading model axes.
    """
    cg, err, _ = surfdisp_roots(
        h, vp, vs, rho, periods, c_prev=None, iwave=iwave, mode=mode,
        igr=igr, iflsph=iflsph, kblock=kblock, nblocks=nblocks,
        krefine=krefine, nrefine=nrefine)
    return cg, err


def surfdisp_batch(h, vp, vs, rho, periods, **kwargs):
    """vmap of :func:`surfdisp` over a leading chain axis."""
    fn = partial(surfdisp, periods=periods, **kwargs)
    return jax.vmap(lambda hh, pp, ss, rr: fn(hh, pp, ss, rr))(
        h, vp, vs, rho)
