"""Pallas TPU kernel for the dispersion secular functions.

The root search evaluates the Rayleigh/Love period equation on many
phase-velocity candidates per chain.  The XLA path (ops/swd.py) scans
over layers with the 5-vector carry materialized between steps; this
kernel keeps the whole Dunkin recursion resident in VMEM — one HBM
read of the candidates and layer arrays, one HBM write of the result —
with the layer loop unrolled over registers.

Layout contract: candidates are flattened per chain to a lane axis
padded to a multiple of 128; layer arrays are (C, NL).  The kernel
tiles chains by 8 (f32 sublane) and processes the full lane axis per
program.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_TILE = 8

# Dynamic layer-count skip (batch kernels): the masked model
# representation pads h with EXACT zeros above the highest active
# layer (ops/voronoi.py:60-93), so every padded slot's Dunkin/Haskell
# update is the identity (d=0 -> cos=1, w=x=0) plus one
# renormalization — pure wasted VPU work.  The batch wrappers compute
# the highest active layer index per 8-chain tile on the XLA side and
# the kernel branches each unrolled layer on it (scalar scf.if: real
# branching in Mosaic, unlike lax.cond under an XLA scan).
# Values differ from the full loop only by the skipped identity-layer
# renormalizations (a positive per-lane scale; signs and root
# positions unchanged).
#
# Measured on a real v5e chip (2026-08-18, 512 chains, L=128,
# nl=21, models 4-8 active layers): the SECULAR kernel's per-layer
# work is a single (8,128) f32 vreg tile, and the scf.if's carry
# save/restore costs MORE than the skipped layers (full 0.019
# ms/call vs dynamic 0.035) — so the skip defaults OFF here.  The RF
# kernel (pallas_rf.py), whose per-layer work is ~50x larger
# (complex 2x2 algebra over the whole frequency axis), measures 17%
# faster with the skip and defaults ON.  BAYHUNTER_DYNAMIC_NL
# overrides both kernels at once; BAYHUNTER_DYNAMIC_NL_SWD just this
# one.
DYNAMIC_NL = os.environ.get(
    'BAYHUNTER_DYNAMIC_NL_SWD',
    os.environ.get('BAYHUNTER_DYNAMIC_NL', '0')) == '1'


def _tile_top_layer(d, ntiles, nl):
    """Highest layer index with nonzero thickness in any chain of each
     8-chain tile; -1 when a tile is all-halfspace.  (T, 1) int32."""
    act = (d > 0.0).reshape(ntiles, C_TILE, nl).any(axis=1)
    idx = jnp.arange(nl, dtype=jnp.int32)
    return jnp.max(jnp.where(act, idx, -1), axis=-1,
                   keepdims=True).astype(jnp.int32)


def _var_quantities(pq, r, prop, dpth):
    """var() quantities given the propagation-regime mask."""
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


def _dltar4_kernel(nl, dynamic, *refs):
    if dynamic:
        (top_ref, wvno_ref, omega_ref, d_ref, a_ref, b_ref, rho_ref,
         out_ref) = refs
    else:
        (wvno_ref, omega_ref, d_ref, a_ref, b_ref, rho_ref,
         out_ref) = refs
        top_ref = None
    wvno = wvno_ref[:]            # (C_TILE, L)
    omega = jnp.maximum(omega_ref[:], 1.0e-4)
    wvno2 = wvno * wvno
    water = b_ref[:, 0:1] <= 0.0  # (C_TILE, 1) surface water layer

    def vert(xk):
        return jnp.sqrt((wvno + xk) * jnp.abs(wvno - xk))

    # halfspace E vector (layer nl-1)
    a_hs = a_ref[:, nl - 1:nl]
    b_hs = b_ref[:, nl - 1:nl]
    rho_hs = rho_ref[:, nl - 1:nl]
    ra = vert(omega / a_hs)
    rb = vert(omega / b_hs)
    t_hs = b_hs / omega
    gammk = 2.0 * t_hs * t_hs
    gam = gammk * wvno2
    gamm1 = gam - 1.0
    e1 = rho_hs * rho_hs * (gamm1 * gamm1 - gam * gammk * ra * rb)
    e2 = -rho_hs * ra
    e3 = rho_hs * (gamm1 - gammk * ra * rb)
    e4 = rho_hs * rb
    e5 = wvno2 - ra * rb

    def layer_update(i, e):
        e1, e2, e3, e4, e5 = e
        d_l = d_ref[:, i:i + 1]
        a_l = a_ref[:, i:i + 1]
        b_l = b_ref[:, i:i + 1]
        rho_l = rho_ref[:, i:i + 1]
        xka = omega / a_l
        xkb = omega / b_l
        rai = vert(xka)
        rbi = vert(xkb)
        t_l = b_l / omega
        gammki = 2.0 * t_l * t_l
        gami = gammki * wvno2

        cosp, w, x, pex = _var_quantities(rai * d_l, rai, wvno < xka,
                                          d_l)
        cosq, y, z, sex = _var_quantities(rbi * d_l, rbi, wvno < xkb,
                                          d_l)
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

        gamm1i = gami - 1.0
        twgm1 = gami + gamm1i
        gmgmk = gami * gammki
        gmgm1 = gami * gamm1i
        gm1sq = gamm1i * gamm1i
        rho2 = rho_l * rho_l
        a0pq = a0 - cpcq

        ca11 = cpcq - 2.0 * gmgm1 * a0pq - gmgmk * xz \
            - wvno2 * gm1sq * wy
        ca12 = (wvno2 * cpy - cqx) / rho_l
        ca13 = -(twgm1 * a0pq + gammki * xz + wvno2 * gamm1i * wy) \
            / rho_l
        ca14 = (cpz - wvno2 * cqw) / rho_l
        ca15 = -(2.0 * wvno2 * a0pq + xz + wvno2 * wvno2 * wy) / rho2
        ca21 = (gmgmk * cpz - gm1sq * cqw) * rho_l
        ca22 = cpcq
        ca23 = gammki * cpz - gamm1i * cqw
        ca24 = -wz
        ca25 = ca14
        ca41 = (gm1sq * cpy - gmgmk * cqx) * rho_l
        ca42 = -xy
        ca43 = gamm1i * cpy - gammki * cqx
        ca44 = ca22
        ca45 = ca12
        ca51 = -(2.0 * gmgmk * gm1sq * a0pq + gmgmk * gmgmk * xz
                 + gm1sq * gm1sq * wy) * rho2
        ca52 = ca41
        ca53 = -(gammki * gamm1i * twgm1 * a0pq
                 + gami * gammki * gammki * xz
                 + gamm1i * gm1sq * wy) * rho_l
        ca54 = ca21
        ca55 = ca11
        tt = -2.0 * wvno2
        ca31 = tt * ca53
        ca32 = tt * ca43
        ca33 = a0 + 2.0 * (cpcq - ca11)
        ca34 = tt * ca23
        ca35 = tt * ca13

        n1 = e1 * ca11 + e2 * ca21 + e3 * ca31 + e4 * ca41 + e5 * ca51
        n2 = e1 * ca12 + e2 * ca22 + e3 * ca32 + e4 * ca42 + e5 * ca52
        n3 = e1 * ca13 + e2 * ca23 + e3 * ca33 + e4 * ca43 + e5 * ca53
        n4 = e1 * ca14 + e2 * ca24 + e3 * ca34 + e4 * ca44 + e5 * ca54
        n5 = e1 * ca15 + e2 * ca25 + e3 * ca35 + e4 * ca45 + e5 * ca55

        nrm = jnp.maximum(jnp.maximum(jnp.abs(n1), jnp.abs(n2)),
                          jnp.maximum(jnp.maximum(jnp.abs(n3),
                                                  jnp.abs(n4)),
                                      jnp.abs(n5)))
        nrm = jnp.where(nrm < 1e-40, 1.0, nrm)
        inv = 1.0 / nrm
        skip = water & (i == 0)   # water top layer handled below
        return (jnp.where(skip, e1, n1 * inv),
                jnp.where(skip, e2, n2 * inv),
                jnp.where(skip, e3, n3 * inv),
                jnp.where(skip, e4, n4 * inv),
                jnp.where(skip, e5, n5 * inv))

    e = (e1, e2, e3, e4, e5)
    if top_ref is None:
        for i in range(nl - 2, -1, -1):
            e = layer_update(i, e)
    else:
        top = top_ref[pl.program_id(0), 0]
        for i in range(nl - 2, -1, -1):
            e = jax.lax.cond(i <= top,
                             functools.partial(layer_update, i),
                             lambda e_: e_, e)
    e1, e2 = e[0], e[1]

    # water-layer surface boundary (surfdisp96.f:850-869)
    a0_l = a_ref[:, 0:1]
    d0_l = d_ref[:, 0:1]
    xka0 = omega / a0_l
    ra0 = vert(xka0)
    cosp_w, w_w, _, _ = _var_quantities(ra0 * d0_l, ra0, wvno < xka0,
                                        d0_l)
    out_ref[:] = jnp.where(water,
                           cosp_w * e1 - rho_ref[:, 0:1] * w_w * e2,
                           e1)


def _dltar1_kernel(nl, dynamic, *refs):
    """Love (SH) secular function: 2-vector Haskell recursion from the
    halfspace up with per-layer renormalization (surfdisp96.f:710-769).
    """
    if dynamic:
        top_ref, wvno_ref, omega_ref, d_ref, b_ref, rho_ref, \
            out_ref = refs
    else:
        wvno_ref, omega_ref, d_ref, b_ref, rho_ref, out_ref = refs
        top_ref = None
    wvno = wvno_ref[:]            # (C_TILE, L)
    omega = jnp.maximum(omega_ref[:], 1.0e-4)
    water = b_ref[:, 0:1] <= 0.0  # (C_TILE, 1) surface water layer

    def vert(xk):
        return jnp.sqrt((wvno + xk) * jnp.abs(wvno - xk))

    b_hs = b_ref[:, nl - 1:nl]
    rho_hs = rho_ref[:, nl - 1:nl]
    e1 = rho_hs * vert(omega / b_hs)          # (C_TILE, L)
    e2 = jnp.broadcast_to(1.0 / (b_hs * b_hs), wvno.shape)

    def layer_update(i, e):
        e1, e2 = e
        d_l = d_ref[:, i:i + 1]
        b_l = b_ref[:, i:i + 1]
        rho_l = rho_ref[:, i:i + 1]
        b_safe = jnp.where(b_l <= 0.0, 1.0, b_l)
        xkb = omega / b_safe
        rb = vert(xkb)
        xmu = rho_l * b_safe * b_safe
        cosq, y, z, _ = _var_quantities(rb * d_l, rb, wvno < xkb, d_l)
        e10 = e1 * cosq + e2 * xmu * z
        e20 = e1 * y / xmu + e2 * cosq
        nrm = jnp.maximum(jnp.abs(e10), jnp.abs(e20))
        nrm = jnp.where(nrm < 1e-40, 1.0, nrm)
        skip = water & (i == 0)   # llw=2: skip a surface water layer
        return (jnp.where(skip, e1, e10 / nrm),
                jnp.where(skip, e2, e20 / nrm))

    e = (e1, e2)
    if top_ref is None:
        for i in range(nl - 2, -1, -1):
            e = layer_update(i, e)
    else:
        top = top_ref[pl.program_id(0), 0]
        for i in range(nl - 2, -1, -1):
            e = jax.lax.cond(i <= top,
                             functools.partial(layer_update, i),
                             lambda e_: e_, e)
    out_ref[:] = e[0]


def dltar1_pallas_single(wvno, omega, d, b, rho, interpret=False):
    """Per-chain Love variant: wvno/omega (L,) with L a multiple of
    128, d/b/rho (NL,)."""
    L = wvno.shape[-1]
    nl = d.shape[-1]

    def spec(width):
        return pl.BlockSpec((1, width), lambda: (0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_dltar1_kernel, nl, False),
        out_shape=jax.ShapeDtypeStruct((1, L), wvno.dtype),
        in_specs=[spec(L), spec(L), spec(nl), spec(nl), spec(nl)],
        out_specs=spec(L),
        interpret=interpret,
    )(wvno[None], omega[None], d[None], b[None], rho[None])
    return out[0]


@functools.partial(jax.jit, static_argnames=('interpret',))
def dltar1_pallas(wvno, omega, d, b, rho, interpret=False):
    """Love secular values for flattened candidates.

    wvno/omega : (C, L) with L a multiple of 128
    d/b/rho    : (C, NL) padded layer arrays (halfspace last)
    Returns (C, L) secular values (sign-exact vs ops.swd.dltar1,
    including the surface-water-layer skip).
    """
    C, L = wvno.shape
    nl = d.shape[-1]

    Cp = -(-C // C_TILE) * C_TILE
    if Cp != C:
        def padc(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (Cp - C,) + x.shape[1:])],
                axis=0)
        wvno, omega, d, b, rho = (padc(x) for x in
                                  (wvno, omega, d, b, rho))

    grid = (Cp // C_TILE,)

    def spec(width):
        return pl.BlockSpec((C_TILE, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(L), spec(L), spec(nl), spec(nl), spec(nl)]
    args = [wvno, omega, d, b, rho]
    if DYNAMIC_NL:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, _tile_top_layer(d, Cp // C_TILE, nl))

    out = pl.pallas_call(
        functools.partial(_dltar1_kernel, nl, DYNAMIC_NL),
        out_shape=jax.ShapeDtypeStruct((Cp, L), wvno.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(L),
        interpret=interpret,
    )(*args)
    return out[:C]


def dltar4_pallas_single(wvno, omega, d, a, b, rho, interpret=False):
    """Per-chain variant: wvno/omega (L,) with L a multiple of 128,
    d/a/b/rho (NL,).  Batches cleanly under ``jax.vmap`` (the chain
    axis becomes a pallas grid dimension)."""
    L = wvno.shape[-1]
    nl = d.shape[-1]

    def spec(width):
        return pl.BlockSpec((1, width), lambda: (0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_dltar4_kernel, nl, False),
        out_shape=jax.ShapeDtypeStruct((1, L), wvno.dtype),
        in_specs=[spec(L), spec(L), spec(nl), spec(nl), spec(nl),
                  spec(nl)],
        out_specs=spec(L),
        interpret=interpret,
    )(wvno[None], omega[None], d[None], a[None], b[None], rho[None])
    return out[0]


@functools.partial(jax.jit, static_argnames=('interpret',))
def dltar4_pallas(wvno, omega, d, a, b, rho, interpret=False):
    """Rayleigh secular values for flattened candidates.

    wvno/omega : (C, L) with L a multiple of 128
    d/a/b/rho  : (C, NL) padded layer arrays (halfspace last)
    Returns (C, L) secular values (sign-exact vs ops.swd.dltar4; no
    water-layer branch — solid surface only).
    """
    C, L = wvno.shape
    nl = d.shape[-1]

    # pad the chain axis to the tile multiple (partial blocks fail to
    # compile); padded rows replicate row 0 and are sliced away
    Cp = -(-C // C_TILE) * C_TILE
    if Cp != C:
        def padc(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (Cp - C,) + x.shape[1:])],
                axis=0)
        wvno, omega, d, a, b, rho = (padc(x) for x in
                                     (wvno, omega, d, a, b, rho))

    grid = (Cp // C_TILE,)

    def spec(width):
        return pl.BlockSpec((C_TILE, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(L), spec(L), spec(nl), spec(nl), spec(nl),
                spec(nl)]
    args = [wvno, omega, d, a, b, rho]
    if DYNAMIC_NL:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, _tile_top_layer(d, Cp // C_TILE, nl))

    out = pl.pallas_call(
        functools.partial(_dltar4_kernel, nl, DYNAMIC_NL),
        out_shape=jax.ShapeDtypeStruct((Cp, L), wvno.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(L),
        interpret=interpret,
    )(*args)
    return out[:C]
