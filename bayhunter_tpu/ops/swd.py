"""Surface-wave dispersion forward solver (pure JAX, batch-first).

Computes Love/Rayleigh phase or group velocity dispersion curves for a
stack of flat (or earth-flattened spherical) layers — the TPU-native
equivalent of the reference's Fortran SURF96 solver
(reference: src/extensions/surfdisp96.f:55-1068).

Algorithm (matching the reference numerics):
  * Rayleigh (P-SV) secular function: Dunkin 5-component compound
    matrix recursion from the halfspace upward, with per-layer
    max-abs renormalization (reference ``dltar4``/``dnka``/``var``/
    ``normc``, surfdisp96.f:773-1068).
  * Love (SH): 2-vector Haskell recursion (reference ``dltar1``,
    surfdisp96.f:710-769).
  * Root search per period: directional bracketing walk with the
    mode-jump polarity guard (reference ``getsol``,
    surfdisp96.f:390-482), followed by fixed-iteration bisection
    (replacing the branch-heavy Neville/bisection hybrid ``nevill`` —
    bisection only needs the *sign* of the secular function, which is
    invariant under the per-layer positive renormalization, so no
    extended-exponent bookkeeping is needed).
  * Group velocity from two phase solves at ``t/(1±h)``, h=0.005
    (reference surfdisp96.f:232-239, 282-307).
  * Spherical earth flattening with layer-midpoint velocity mapping
    and Biswas density mapping (reference ``sphere``,
    surfdisp96.f:486-553).

Shape contract: all layer arrays are fixed-width ``(NL,)`` with the
halfspace in the LAST slot and zero-thickness padded slots replicating
the halfspace in between (see ops/voronoi.py).  A zero-thickness layer
contributes an identity propagator, so padding never changes results.
No data-dependent shapes anywhere; everything vmaps over a chain axis.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

TWOPI = 2.0 * jnp.pi
DDC = 0.005          # phase-velocity bracketing increment (surfdisp96.f:126)
SONE = 1.5           # back-off multiplier "sone" (surfdisp96.f:124)
HGR = 0.005          # group-velocity frequency increment (surfdisp96.f:128)
ONE = 1.0e-2         # clow offset multiplier (surfdisp96.f:136)
EARTH_R = 6370.0     # sphere(): ar (surfdisp96.f:517)


# --------------------------------------------------------------------------
# secular functions
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


def _dnka(wvno2, gam, gammk, rho, a0, cpcq, cpy, cpz, cqw, cqx,
          xy, xz, wy, wz):
    """Dunkin's 5x5 compound matrix (surfdisp96.f:1024-1068)."""
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

    row1 = jnp.stack([ca11, ca12, ca13, ca14, ca15], axis=-1)
    row2 = jnp.stack([ca21, ca22, ca23, ca24, ca25], axis=-1)
    row3 = jnp.stack([ca31, ca32, ca33, ca34, ca35], axis=-1)
    row4 = jnp.stack([ca41, ca42, ca43, ca44, ca45], axis=-1)
    row5 = jnp.stack([ca51, ca52, ca53, ca54, ca55], axis=-1)
    return jnp.stack([row1, row2, row3, row4, row5], axis=-2)


def dltar4(wvno, omega, d, a, b, rho, water):
    """Rayleigh-wave period (secular) equation.

    Port of ``dltar4`` (surfdisp96.f:773-871).  ``d,a,b,rho`` are
    ``(NL,)`` padded layer arrays with the halfspace in the last slot;
    ``water`` is a boolean scalar (surface water layer present).
    Returns a value whose sign (and approximate relative magnitude)
    matches the reference; overall positive scale is arbitrary due to
    per-layer renormalization.
    """
    omega = jnp.maximum(omega, 1.0e-4)
    wvno2 = wvno * wvno

    xka = omega / a
    xkb = omega / b
    ra = _vertical_wavenumber(wvno, xka)
    rb = _vertical_wavenumber(wvno, xkb)

    # halfspace E vector (surfdisp96.f:798-808)
    t_hs = b[-1] / omega
    gammk_hs = 2.0 * t_hs * t_hs
    gam_hs = gammk_hs * wvno2
    gamm1_hs = gam_hs - 1.0
    rho_hs = rho[-1]
    e = jnp.stack([
        rho_hs * rho_hs * (gamm1_hs * gamm1_hs
                           - gam_hs * gammk_hs * ra[-1] * rb[-1]),
        -rho_hs * ra[-1],
        rho_hs * (gamm1_hs - gammk_hs * ra[-1] * rb[-1]),
        rho_hs * rb[-1],
        wvno2 - ra[-1] * rb[-1],
    ])

    # per-layer var() + dnka() quantities, all layers at once
    t_l = b / omega
    gammk = 2.0 * t_l * t_l
    gam = gammk * wvno2
    p = ra * d
    q = rb * d

    cosp, w, x, pex = _var_quantities(p, ra, wvno, xka, d)
    cosq, y, z, sex = _var_quantities(q, rb, wvno, xkb, d)

    exa = pex + sex
    a0 = jnp.where(exa < 60.0, jnp.exp(-exa), 0.0)
    cpcq = cosp * cosq
    cpy = cosp * y
    cpz = cosp * z
    cqw = cosq * w
    cqx = cosq * x
    xy = x * y
    xz = x * z
    wy = w * y
    wz = w * z

    ca = _dnka(wvno2, gam, gammk, rho, a0, cpcq, cpy, cpz, cqw, cqx,
               xy, xz, wy, wz)  # (NL, 5, 5)

    nl = d.shape[-1]
    # multiply from the layer above the halfspace (slot NL-2) upward to
    # the surface (slot 0); if a water layer is present the top solid
    # layer is slot 1 and slot 0 is handled by the water boundary below.
    def step(ee, inputs):
        ca_m, is_top_water = inputs
        een = ee @ ca_m
        een = jnp.where(is_top_water, ee, een)  # skip water layer
        nrm = jnp.max(jnp.abs(een))
        nrm = jnp.where(nrm < 1e-40, 1.0, nrm)
        return een / nrm, None

    order = jnp.arange(nl - 2, -1, -1)
    ca_seq = ca[order]
    skip_seq = water & (order == 0)
    e, _ = lax.scan(step, e, (ca_seq, skip_seq))

    # water-layer surface boundary (surfdisp96.f:850-869)
    cosp_w, w_w, _, _ = _var_quantities(ra[0] * d[0], ra[0], wvno, xka[0],
                                        d[0])
    w0 = -rho[0] * w_w
    return jnp.where(water, cosp_w * e[0] + w0 * e[1], e[0])


def dltar1(wvno, omega, d, a, b, rho, water):
    """Love-wave period (secular) equation.

    Port of ``dltar1`` (surfdisp96.f:710-769): 2-vector Haskell
    recursion from the halfspace up, with per-layer renormalization.
    A surface water layer is skipped (llw=2 semantics).
    """
    xkb = omega / b
    rb = _vertical_wavenumber(wvno, xkb)
    e1 = rho[-1] * rb[-1]
    e2 = 1.0 / (b[-1] * b[-1])

    xmu = rho * b * b
    q = d * rb
    cosq, y, z, _ = _var_quantities(q, rb, wvno, xkb, d)
    # sign convention of dltar1: z = -rb*sinq (propagating) / +rb*sinq
    # (evanescent) — identical to the shared helper.

    nl = d.shape[-1]

    def step(carry, inputs):
        e1c, e2c = carry
        cosq_m, y_m, z_m, xmu_m, skip = inputs
        e10 = e1c * cosq_m + e2c * xmu_m * z_m
        e20 = e1c * y_m / xmu_m + e2c * cosq_m
        nrm = jnp.maximum(jnp.abs(e10), jnp.abs(e20))
        nrm = jnp.where(nrm < 1e-40, 1.0, nrm)
        e1n = jnp.where(skip, e1c, e10 / nrm)
        e2n = jnp.where(skip, e2c, e20 / nrm)
        return (e1n, e2n), None

    order = jnp.arange(nl - 2, -1, -1)
    skip_seq = water & (order == 0)
    (e1, e2), _ = lax.scan(
        step, (e1, e2),
        (cosq[order], y[order], z[order], xmu[order], skip_seq))
    return e1


def _dltar(wvno, omega, d, a, b, rho, water, iwave):
    if iwave == 1:
        return dltar1(wvno, omega, d, a, b, rho, water)
    return dltar4(wvno, omega, d, a, b, rho, water)


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
    nl = d.shape[-1]
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


# --------------------------------------------------------------------------
# root bracketing + refinement
# --------------------------------------------------------------------------

def _getsol(t1, c1, clow, del1st, ifirst, cm, betmx, secular,
            max_bracket, nbisect, dtype):
    """Bracket the dispersion root and refine it (surfdisp96.f:390-482).

    ``secular(wvno, omega)`` evaluates the period equation.  Returns
    (c_root, success, del1st).  The Neville refinement of the reference
    is replaced by fixed-count bisection: only the sign of the secular
    function is used, which is invariant under the renormalized
    recursion, and the fixed iteration count maps cleanly onto XLA.
    """
    dc = jnp.asarray(DDC, dtype)
    omega = TWOPI / t1

    del1 = secular(omega / c1, omega)
    del1st = jnp.where(ifirst, del1, del1st)
    plmn = jnp.sign(del1st) * jnp.sign(del1)
    idir = jnp.where(ifirst | (plmn >= 0.0), 1.0, -1.0).astype(dtype)

    def cond(state):
        c1_, del1_, idir_, c2_, del2_, done, fail, k = state
        return jnp.logical_not(done | fail)

    def body(state):
        c1_, del1_, idir_, c2_, del2_, done, fail, k = state
        c2n = c1_ + idir_ * dc
        reset = c2n <= clow
        c1n = jnp.where(reset, clow, c1_)
        idirn = jnp.where(reset, 1.0, idir_)
        c2n = jnp.where(reset, c1n + dc, c2n)
        del2n = secular(omega / c2n, omega)
        bracket = jnp.sign(del1_) != jnp.sign(del2n)
        failn = (~bracket) & ((c2n < cm) | (c2n >= betmx + dc)
                              | (k >= max_bracket))
        c1n2 = jnp.where(bracket, c1n, c2n)
        del1n = jnp.where(bracket, del1_, del2n)
        return (c1n2, del1n, idirn, c2n, del2n, bracket, failn, k + 1)

    state0 = (c1, del1, idir, c1, del1,
              jnp.asarray(False), jnp.asarray(False), jnp.asarray(0))
    c1b, del1b, _, c2b, del2b, found, fail, _ = lax.while_loop(
        cond, body, state0)

    # bisection refinement within [c1b, c2b]
    def bis(i, st):
        lo, dlo, hi = st
        mid = 0.5 * (lo + hi)
        dmid = secular(omega / mid, omega)
        same = jnp.sign(dmid) == jnp.sign(dlo)
        lo_n = jnp.where(same, mid, lo)
        dlo_n = jnp.where(same, dmid, dlo)
        hi_n = jnp.where(same, hi, mid)
        return (lo_n, dlo_n, hi_n)

    lo, _, hi = lax.fori_loop(0, nbisect, bis, (c1b, del1b, c2b))
    cn = 0.5 * (lo + hi)
    success = found & (cn <= betmx)
    return cn, success, del1st


# --------------------------------------------------------------------------
# public driver
# --------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=('iwave', 'mode', 'igr', 'iflsph', 'nbisect',
                          'max_bracket'))
def surfdisp(h, vp, vs, rho, periods, iwave=2, mode=1, igr=0, iflsph=0,
             nbisect=None, max_bracket=1200):
    """Dispersion curve for one padded layer model.

    Arguments mirror the reference entry point
    (surfdisp96.f:55-56 / src/surf96_modsw.py:84-126):

      h, vp, vs, rho : (NL,) padded layer arrays, halfspace last
      periods        : (P,) periods in s (monotone increasing)
      iwave          : 1 Love, 2 Rayleigh
      mode           : 1 fundamental, 2 first higher, ...
      igr            : 0 phase velocity, >0 group velocity
      iflsph         : 0 flat earth, 1 spherical (flattening applied)

    Returns ``(cg, err)`` with ``cg`` shape (P,) phase/group velocities
    (zeros after a failed period, as the reference) and ``err`` True if
    the fundamental mode failed anywhere (the reference then returns
    NaN data from the plugin; src/surf96_modsw.py:119-126).

    Batch with ``jax.vmap`` over the leading model axes.
    """
    dtype = h.dtype
    if nbisect is None:
        nbisect = 50 if dtype == jnp.float64 else 30

    if iflsph == 1:
        d, a, b, rho_w = sphere_flatten(h, vp, vs, rho, iwave)
    else:
        d, a, b, rho_w = h, vp, vs, rho

    water = b[0] <= 0.0

    # extremal velocities & starting phase velocity (surfdisp96.f:140-217)
    solid = b > 0.01
    cand = jnp.where(solid, b, a)
    jmn = jnp.argmin(cand)
    betmn = cand[jmn]
    jsol = solid[jmn]
    betmx = jnp.max(b)

    cc1 = jnp.where(jsol, gtsolh(a[jmn], b[jmn]), betmn)
    cc1 = 0.95 * 0.90 * cc1
    cc = cc1.astype(dtype)
    cm = cc
    dc = jnp.asarray(DDC, dtype)
    onea = jnp.asarray(SONE, dtype)

    def secular(wvno, omega):
        return _dltar(wvno, omega, d, a, b, rho_w, water, iwave)

    nper = periods.shape[0]
    zero = jnp.zeros((), dtype)

    c_prev_mode = jnp.zeros((nper,), dtype)  # c() of previous mode
    cg_out = jnp.zeros((nper,), dtype)
    err_out = jnp.asarray(False)

    prev_mode_failed = jnp.zeros((nper,), bool)  # "ift" of surfdisp96.f:348

    for iq in range(1, mode + 1):
        def period_step(carry, inputs):
            c_pm1, cb_pm1, del1st, failed = carry
            k, t, c_mode_prev_k, c_mode_prev_0, pm_failed_k = inputs
            is_first = k == 0

            t1 = jnp.asarray(t, dtype)
            if igr > 0:
                t1a = t1 / (1.0 + HGR)
                t1b = t1 / (1.0 - HGR)
            else:
                t1a = t1
                t1b = t1

            if iq == 1:
                c1_f = cc
                clow_f = cc
                c1_nf = c_pm1 - onea * dc
                clow_nf = cm
            else:
                c1_f = c_mode_prev_0 + ONE * dc
                clow_f = c1_f
                clow_nf = c_mode_prev_k + ONE * dc
                c1_nf = jnp.maximum(c_pm1, clow_nf)

            c1 = jnp.where(is_first, c1_f, c1_nf)
            clow = jnp.where(is_first, clow_f, clow_nf)

            c_k, ok_a, del1st = _getsol(
                t1a, c1, clow, del1st, is_first, cm, betmx, secular,
                max_bracket, nbisect, dtype)

            if igr > 0:
                clow_b = cb_pm1 + ONE * dc
                c1_b = c_k - onea * dc
                cb_k, ok_b, _ = _getsol(
                    t1b, c1_b, clow_b, del1st, jnp.asarray(False), cm,
                    betmx, secular, max_bracket, nbisect, dtype)
                cb_k = jnp.where(ok_b, cb_k, c_k)
                gvel = ((1.0 / t1a - 1.0 / t1b)
                        / (1.0 / (t1a * c_k) - 1.0 / (t1b * cb_k)))
                out_k = gvel
            else:
                cb_k = zero
                out_k = c_k

            failed_n = failed | (~ok_a) | pm_failed_k
            out_k = jnp.where(failed_n, zero, out_k)
            c_store = jnp.where(failed_n, c_pm1, c_k)
            cb_store = jnp.where(failed_n, cb_pm1, cb_k)
            return ((c_store, cb_store, del1st, failed_n),
                    (out_k, jnp.where(failed_n, zero, c_k), failed_n))

        ks = jnp.arange(nper)
        init = (cc, zero, zero, jnp.asarray(False))
        (_, _, _, any_failed), (cg_m, c_m, failed_seq) = lax.scan(
            period_step, init,
            (ks, periods.astype(dtype), c_prev_mode,
             jnp.broadcast_to(c_prev_mode[0], (nper,)), prev_mode_failed))

        cg_out = cg_m
        if iq == 1:
            err_out = any_failed
        c_prev_mode = c_m
        prev_mode_failed = failed_seq

    return cg_out, err_out


def surfdisp_batch(h, vp, vs, rho, periods, **kwargs):
    """vmap of :func:`surfdisp` over a leading chain axis."""
    fn = partial(surfdisp, periods=periods, **kwargs)
    return jax.vmap(lambda hh, pp, ss, rr: fn(hh, pp, ss, rr))(
        h, vp, vs, rho)
