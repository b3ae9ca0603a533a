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

# Chains per program tile (sublane dim of the secular/walker blocks).
# 8 = one f32 vreg of sublanes; 16 is the measured optimum end-to-end
# (same per-tile fixed-work amortization that won the RF kernel +6.7%
# at 16): on-chip @10,240-chain bench 2026-08-20, 8/16/32 =
# 1.893M/2.007M/1.982M proposals/s (normalizer 149.0/155.5/156.3,
# adjusted 12.70/12.90/12.68 per normalizer unit), reject classes
# bit-flat (4.648/10.954) — the walker's coarser block early-exit at
# 16 costs less than the amortization buys; 32 tips the other way.
def _parse_ctile(env_name, default):
    """Chain-tile env override, validated at import: Mosaic block
    shapes need a positive multiple of 8 (the f32 sublane tile) —
    anything else fails deep in layout inference with an opaque
    error, so reject it here with an actionable one."""
    raw = os.environ.get(env_name, default)
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f'{env_name}={raw!r}: must be an integer') from None
    if val <= 0 or val % 8 != 0:
        raise ValueError(
            f'{env_name}={val}: chain tile must be a positive '
            f'multiple of 8 (f32 sublane tile)')
    return val


C_TILE = _parse_ctile('BAYHUNTER_SWD_CTILE', '16')

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
# Three modes, A/B'd on a real v5e chip (2026-08-18,
# scripts/bench_secular_scaling.py + bench.py, same session,
# normalizer 152-156 TFLOP/s):
#   None      full unrolled 21-layer loop
#   'branch'  each unrolled layer wrapped in scalar scf.if (i <= top)
#   'loop'    ONE dynamic-trip fori_loop top..0; per-layer properties
#             fetched by one-hot mask + lane reduction (_dyn_col),
#             because Mosaic rejects dynamic lane-dim vector loads
# Kernel-level at the warm solve's REAL shapes (C=512, models 4-8
# active of nl=21): L=384: 422/246/246 us, L=768: 896/459/443 us —
# the skip HALVES the kernel.  End-to-end bench.py: 128.8k (off) /
# 170.0k (branch) / 173.8k (loop) proposals/s.  An earlier session
# measured 'branch' 2x SLOWER — that was an L=128 microbench artifact
# (cond carry save/restore dominating a single-vreg lane axis) plus a
# stderr-masked fallback; loop is now the PRODUCTION DEFAULT.
# Roots are sign-exact vs the full loop (values differ only by the
# skipped identity-layer renormalizations, a positive scale); the
# secant polish sees those scale differences, so trajectories are not
# bit-identical — statistical posterior equivalence is the contract
# (VALIDATION.md).
# BAYHUNTER_DYNAMIC_NL=0 disables the skip in both this and the RF
# kernel; BAYHUNTER_DYNAMIC_NL_SWD={0,branch,loop} just this one.
_DYN_ENV = os.environ.get(
    'BAYHUNTER_DYNAMIC_NL_SWD',
    os.environ.get('BAYHUNTER_DYNAMIC_NL', 'loop'))
DYNAMIC_NL_MODE = {'1': 'branch', 'branch': 'branch',
                   'loop': 'loop'}.get(_DYN_ENV)


def _tile_top_layer(d, ntiles, nl):
    """Highest layer index with nonzero thickness in any chain of each
     8-chain tile; -1 when a tile is all-halfspace.  (T, 1) int32."""
    act = (d > 0.0).reshape(ntiles, C_TILE, nl).any(axis=1)
    idx = jnp.arange(nl, dtype=jnp.int32)
    # ONE (1, ntiles) SMEM row: an (ntiles, 1) column pads each row
    # to 512 B in the SMEM window, overflowing the 1 MB window from
    # ~2048 tiles (the 40,960-chain compile failure); a single row
    # costs 4*ntiles bytes and Mosaic supports the dynamic minor-dim
    # scalar read top_ref[0, program_id]
    return jnp.max(jnp.where(act, idx, -1), axis=-1,
                   keepdims=True).astype(jnp.int32).reshape(1, -1)


def _dyn_col(ref, i, nl):
    """Column i of a (C_TILE, nl) VMEM block for a TRACED scalar i.
    Mosaic cannot prove alignment for a dynamic lane-dim vector load
    (vector.load at index i fails "multiple of 128"), so the column is
    extracted with a one-hot mask + lane reduction — three cheap
    vector ops, no dynamic addressing."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (C_TILE, nl), 1)
    return jnp.sum(jnp.where(lane == i, ref[:], 0.0), axis=1,
                   keepdims=True)


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


def _dltar4_halfspace(wvno, wvno2, omega, a_hs, b_hs, rho_hs):
    """Halfspace E vector (all elementwise; inputs broadcastable)."""
    def vert(xk):
        return jnp.sqrt((wvno + xk) * jnp.abs(wvno - xk))

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
    return (e1, e2, e3, e4, e5)


def _dltar4_layer_math(e, wvno, wvno2, omega, d_l, a_l, b_l, rho_l,
                       skip):
    """One Dunkin layer update (elementwise; inputs broadcastable).
    ``skip`` lanes keep the incoming E vector (water surface layer)."""
    def vert(xk):
        return jnp.sqrt((wvno + xk) * jnp.abs(wvno - xk))

    e1, e2, e3, e4, e5 = e
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
    return (jnp.where(skip, e1, n1 * inv),
            jnp.where(skip, e2, n2 * inv),
            jnp.where(skip, e3, n3 * inv),
            jnp.where(skip, e4, n4 * inv),
            jnp.where(skip, e5, n5 * inv))


def _dltar1_layer_math(e, wvno, omega, d_l, b_l, rho_l, skip):
    """One Haskell SH layer update (elementwise; broadcastable)."""
    def vert(xk):
        return jnp.sqrt((wvno + xk) * jnp.abs(wvno - xk))

    e1, e2 = e
    b_safe = jnp.where(b_l <= 0.0, 1.0, b_l)
    xkb = omega / b_safe
    rb = vert(xkb)
    xmu = rho_l * b_safe * b_safe
    cosq, y, z, _ = _var_quantities(rb * d_l, rb, wvno < xkb, d_l)
    e10 = e1 * cosq + e2 * xmu * z
    e20 = e1 * y / xmu + e2 * cosq
    nrm = jnp.maximum(jnp.abs(e10), jnp.abs(e20))
    nrm = jnp.where(nrm < 1e-40, 1.0, nrm)
    return (jnp.where(skip, e1, e10 / nrm),
            jnp.where(skip, e2, e20 / nrm))


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

    e1, e2, e3, e4, e5 = _dltar4_halfspace(
        wvno, wvno2, omega, a_ref[:, nl - 1:nl], b_ref[:, nl - 1:nl],
        rho_ref[:, nl - 1:nl])

    def layer_update(i, e, dyn_i=False):
        if dyn_i:
            d_l = _dyn_col(d_ref, i, nl)
            a_l = _dyn_col(a_ref, i, nl)
            b_l = _dyn_col(b_ref, i, nl)
            rho_l = _dyn_col(rho_ref, i, nl)
        else:
            d_l = d_ref[:, i:i + 1]
            a_l = a_ref[:, i:i + 1]
            b_l = b_ref[:, i:i + 1]
            rho_l = rho_ref[:, i:i + 1]
        skip = water & (i == 0)   # water top layer handled below
        return _dltar4_layer_math(e, wvno, wvno2, omega, d_l, a_l,
                                  b_l, rho_l, skip)
    e = (e1, e2, e3, e4, e5)
    if top_ref is None:
        for i in range(nl - 2, -1, -1):
            e = layer_update(i, e)
    elif dynamic == 'loop':
        top = jnp.minimum(top_ref[0, pl.program_id(0)], nl - 2)
        # one dynamic-trip loop over the active layers top..0 (padded
        # slots above top are identity + renormalization — skipped)
        e = jax.lax.fori_loop(
            0, top + 1,
            lambda j, e_: layer_update(top - j, e_, dyn_i=True), e)
    else:
        top = top_ref[0, pl.program_id(0)]
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

    def layer_update(i, e, dyn_i=False):
        if dyn_i:
            d_l = _dyn_col(d_ref, i, nl)
            b_l = _dyn_col(b_ref, i, nl)
            rho_l = _dyn_col(rho_ref, i, nl)
        else:
            d_l = d_ref[:, i:i + 1]
            b_l = b_ref[:, i:i + 1]
            rho_l = rho_ref[:, i:i + 1]
        skip = water & (i == 0)   # llw=2: skip a surface water layer
        return _dltar1_layer_math(e, wvno, omega, d_l, b_l, rho_l,
                                  skip)

    e = (e1, e2)
    if top_ref is None:
        for i in range(nl - 2, -1, -1):
            e = layer_update(i, e)
    elif dynamic == 'loop':
        top = jnp.minimum(top_ref[0, pl.program_id(0)], nl - 2)
        e = jax.lax.fori_loop(
            0, top + 1,
            lambda j, e_: layer_update(top - j, e_, dyn_i=True), e)
    else:
        top = top_ref[0, pl.program_id(0)]
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
    if DYNAMIC_NL_MODE:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, _tile_top_layer(d, Cp // C_TILE, nl))

    out = pl.pallas_call(
        functools.partial(_dltar1_kernel, nl, DYNAMIC_NL_MODE),
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
    if DYNAMIC_NL_MODE:
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))
        args.insert(0, _tile_top_layer(d, Cp // C_TILE, nl))

    out = pl.pallas_call(
        functools.partial(_dltar4_kernel, nl, DYNAMIC_NL_MODE),
        out_shape=jax.ShapeDtypeStruct((Cp, L), wvno.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=spec(L),
        interpret=interpret,
    )(*args)
    return out[:C]
