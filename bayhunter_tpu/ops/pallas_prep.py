"""RF operand preparation kernel (the "model kernel", RF side).

One pallas program per 128-chain lane tile consumes the transposed
(NL, C) layer planes straight out of the voronoi conversion and
emits, entirely from VMEM:

  * the earth-flattened layer properties (model.cpp:223-251
    semantics, ops/rf.py flatten_model),
  * the full welded-interface R/T coefficient table
    (greens.cpp:19-85; layer-major rows l*32 + m*8 + e*2 + c),
  * the per-chain frequency-independent scalars [t0, hmat, nt]
    (greens.cpp:87-112, 307-322, 509-526),
  * the dynamic-skip depth (deepest consequential layer) row.

Rationale: the XLA-level versions of these (interface_coeffs_xla_t,
chain_scalars_xla_t, the pack concatenates) cost ~0.7-0.9 ms of a
~5 ms production step at 10,240 chains — dozens of small fusions,
concatenates and relayout copies each paying the ~µs per-op device
floor (the round-4 "~440-op step tail" diagnosis; VERDICT round-4
item 1).  In-kernel the same math runs as one program on full-lane
(x, 128) vregs with zero intermediate HBM round-trips.

Outputs stay in the TRANSPOSED layout — (640, C) and (88, C) — and
the caller transposes them once in XLA (~0.02 ms each; in-kernel
transposes were measured 0.4 ms, XLA big-minor transposes are
lane-parallel and cheap).  Everything is static: slowness and wave
type specialize the program per target.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bayhunter_tpu.ops.pallas_rf import (_displacement, _free_surface,
                                         _interface_coeffs)

LANES = 128
EARTH_R = 6371.0   # rfmini's radius (ops/rf.py flatten_model;
#                    NOT the SWD solver's 6370 — documented there)

# pack row layout (matches ops/pallas_rf._resp_kernel packed mode):
#   rows 0..NL-1     flattened h
#   rows NL..2NL-1   flattened vp
#   rows 2NL..3NL-1  flattened vs
#   row  3NL         slowness p
#   rows 3NL+1..3NL+17  [t0, hmat x8, nt x8]
#   row  3NL+18      dynamic-skip depth (deepest consequential layer)
# padded with zero rows to the next multiple of 8.


def pack_rows(nl):
    return 3 * nl + 19


def pack_rows_padded(nl):
    r = pack_rows(nl)
    return -(-r // 8) * 8


def _rf_rows(nl, p, wave_type, flattening, h, vp, vs, rho,
             coef_ref, pack_ref):
    """RF operand math on (NL, 128) layer planes, writing the
    coefficient table and the per-chain pack refs (the body of the
    original RF prep kernel, shared with the unified model kernel)."""
    pj = jnp.float32(p)

    if flattening:
        # z -> R ln(R/(R-z)) at layer tops; v R/r; rho r/R
        # (flatten_model).  Manual running sum: jnp.cumsum has no
        # Mosaic lowering; the unrolled row loop reproduces its exact
        # sequential f32 order.
        acc = jnp.zeros_like(h[0:1])
        ztops = []
        for i in range(nl):
            ztops.append(acc)
            acc = acc + h[i:i + 1]
        z_top = jnp.concatenate(ztops, axis=0)
        z_bot = z_top + h
        q_top = EARTH_R / (EARTH_R - z_top)
        zf_top = EARTH_R * jnp.log(q_top)
        zf_bot = EARTH_R * jnp.log(EARTH_R / (EARTH_R - z_bot))
        h = zf_bot - zf_top
        vp = vp * q_top
        vs = vs * q_top
        rho = rho / q_top

    # interface R/T coefficient tables on (NL-1, 128) slices
    mats = _interface_coeffs(pj, vp[:-1], vs[:-1], rho[:-1],
                             vp[1:], vs[1:], rho[1:])
    shape = (nl - 1, h.shape[1])
    for l in range(nl - 1):
        rows = []
        for mat in mats:                 # rd, td, ru, tu
            for entry in mat:            # (11, 12, 21, 22)
                rows.append(jnp.broadcast_to(entry[0],
                                             shape)[l:l + 1])
                rows.append(jnp.broadcast_to(entry[1],
                                             shape)[l:l + 1])
        coef_ref[l * 32:(l + 1) * 32, :] = jnp.concatenate(rows,
                                                           axis=0)

    # per-chain scalars: direct-arrival time (halfspace h = -1
    # sentinel), free-surface displacement matrix, free-surface
    # reflection — all on flattened properties like the XLA version
    v = vp if wave_type == 0 else vs
    qv = jnp.sqrt(jnp.maximum(1.0 / (v * v) - pj * pj, 0.0))
    sgn_h = jnp.concatenate([h[:-1], -jnp.ones_like(h[0:1])],
                            axis=0)
    t0 = jnp.sum(sgn_h * qv, axis=0, keepdims=True)     # (1, 128)
    hmat = _displacement(pj, vp[0:1], vs[0:1])
    nt = _free_surface(pj, vp[0:1], vs[0:1])
    scal_rows = [t0]
    for m in hmat:
        scal_rows.append(jnp.broadcast_to(m[0], t0.shape))
        scal_rows.append(jnp.broadcast_to(m[1], t0.shape))
    for m in nt:
        scal_rows.append(jnp.broadcast_to(m[0], t0.shape))
        scal_rows.append(jnp.broadcast_to(m[1], t0.shape))

    # dynamic-skip depth: deepest layer with nonzero thickness or any
    # property contrast across its lower interface (pallas_rf driver)
    real = ((h[:-1] > 0.0)
            | (vp[:-1] != vp[1:])
            | (vs[:-1] != vs[1:])
            | (rho[:-1] != rho[1:]))
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    depth = jnp.max(jnp.where(real, idx, 0), axis=0,
                    keepdims=True).astype(jnp.float32)

    rows = ([h, vp, vs, jnp.full_like(t0, pj)] + scal_rows
            + [depth])
    npad = pack_rows_padded(nl) - pack_rows(nl)
    if npad:
        rows.append(jnp.zeros((npad, h.shape[1]), h.dtype))
    pack_ref[:] = jnp.concatenate(rows, axis=0)


def _prep_kernel(nl, p, wave_type, flattening, *refs):
    h_ref, vp_ref, vs_ref, rho_ref, coef_ref, pack_ref = refs
    _rf_rows(nl, p, wave_type, flattening, h_ref[:], vp_ref[:],
             vs_ref[:], rho_ref[:], coef_ref, pack_ref)


# --------------------------------------------------------------------------
# the unified MODEL KERNEL: voronoi conversion + prior validity + the
# per-target solver operand preparation in ONE pallas program.
#
# The round-4/5 step-tail diagnosis (docs/performance.md): the
# production step's cost floor is its top-level XLA op COUNT — ~136
# ops at ~µs-scale device scheduling cost each, batch-invariant, which
# dominates the small-batch regime (the reference's own 21-chain
# operating point) and is ~0.6 ms of the 10,240-chain step.  The XLA
# versions of the voronoi conversion (ops/voronoi.voronoi_to_layers_T),
# the prior validity chain (model_is_valid_T), the SWD lower-bound /
# max-velocity prep (ops/swd.py:915-959, gtsolh Newton), the spherical
# flattening and the walker prop-stack assembly are each only a handful
# of fused ops — but TOGETHER they are ~40+ top-level ops per step.
# Here they all run on full-lane (x, 128) vregs inside one program.
#
# Reference behavior fused (cited per piece): src/Models.py:40-52
# (voronoi -> layer conversion), src/SingleChain.py:330-392 (prior
# checks), surfdisp96.f:140-217 + 367-388 (cm/betmx, gtsolh),
# surfdisp96.f:486-553 (spherical flattening), model.cpp:223-251 +
# greens.cpp:19-112 (RF flattening, interface coefficients, scalars).
# --------------------------------------------------------------------------

SWD_EARTH_R = 6370.0   # surfdisp96.f:517 (ar) — NOT the RF 6371


def _voronoi_rows(nl, mantle, vs, z, n_row, vpvs_row):
    """In-kernel :func:`ops.voronoi.voronoi_to_layers_T` on (NL, 128)
    planes; ``n_row`` (1, 128) i32, ``vpvs_row`` (1, 128) f32."""
    idx = jax.lax.broadcasted_iota(jnp.int32, vs.shape, 0)
    z_next = jnp.concatenate([z[1:], z[-1:]], axis=0)
    z_disc = 0.5 * (z + z_next)
    z_disc_prev = jnp.concatenate(
        [jnp.zeros_like(z_disc[:1]), z_disc[:-1]], axis=0)
    h = jnp.where(idx < n_row - 1, z_disc - z_disc_prev, 0.0)

    vp = vs * vpvs_row
    in_m = None
    if mantle is not None:
        valid = idx < n_row
        is_m = jnp.where((vs >= mantle[0]) & valid, 1.0, 0.0)
        any_m = jnp.max(is_m, axis=0, keepdims=True) > 0.5
        first_m = jnp.min(jnp.where(is_m > 0.5, idx, nl), axis=0,
                          keepdims=True)
        in_m = any_m & (idx >= first_m)
        vp = jnp.where(in_m, vs * mantle[1], vp)

    finite = idx < n_row - 1
    hs_hot = idx == jnp.clip(n_row - 1, 0, nl - 1)
    vs_hs = jnp.sum(jnp.where(hs_hot, vs, 0.0), axis=0,
                    keepdims=True)
    vp_hs = vs_hs * vpvs_row
    if mantle is not None:
        hs_in_m = jnp.max(jnp.where(hs_hot & in_m, 1.0, 0.0),
                          axis=0, keepdims=True) > 0.5
        vp_hs = jnp.where(hs_in_m, vs_hs * mantle[1], vp_hs)

    vs_l = jnp.where(finite, vs, vs_hs)
    vp_l = jnp.where(finite, vp, vp_hs)
    rho = vp_l * 0.32 + 0.77
    return h, vp_l, vs_l, rho


def _valid_rows(nl, cfgt, h, vs, z, n_row):
    """In-kernel :func:`ops.voronoi.model_is_valid_T`; returns a
    (1, 128) f32 0/1 row.  Boolean reductions run as f32 min/max
    indicators (Mosaic i1 vectors are poor reduction citizens)."""
    (layermin, layermax, vsmin, vsmax, zmin, zmax, thickmin,
     lvz, hvz) = cfgt
    idx = jax.lax.broadcasted_iota(jnp.int32, vs.shape, 0)
    valid = idx < n_row
    pair = idx < n_row - 1

    nlayer = n_row - 1
    ok = (nlayer >= layermin) & (nlayer <= layermax)   # (1, 128)

    one = jnp.ones_like(h)
    ind = jnp.where(pair, jnp.where(h >= thickmin, 1.0, 0.0), one)
    ind = ind * jnp.where(
        valid, jnp.where((vs >= vsmin) & (vs <= vsmax), 1.0, 0.0),
        one)

    # interface depths: sequential running sum (jnp.cumsum has no
    # Mosaic lowering; same per-layer f32 order as the XLA
    # reduce-window up to reassociation)
    acc = jnp.zeros_like(h[0:1])
    zc_rows = []
    for i in range(nl):
        acc = acc + h[i:i + 1]
        zc_rows.append(acc)
    zc = jnp.concatenate(zc_rows, axis=0)
    ind = ind * jnp.where(
        valid, jnp.where((zc >= zmin) & (zc <= zmax), 1.0, 0.0), one)

    vs_next = jnp.concatenate([vs[1:], vs[-1:]], axis=0)
    if lvz is not None:
        ind = ind * jnp.where(
            pair, jnp.where(vs_next - vs * (1.0 - lvz) > 0, 1.0, 0.0),
            one)
    if hvz is not None:
        ind = ind * jnp.where(
            pair, jnp.where(vs * (1.0 + hvz) - vs_next > 0, 1.0, 0.0),
            one)

    all_ok = jnp.min(ind, axis=0, keepdims=True) > 0.5
    return jnp.where(ok & all_ok, 1.0, 0.0)


def _swd_rows(nl, iwave, iflsph, h, vp, vs, rho,
              props_ref, cm_ref, bx_ref, top_ref):
    """SWD-side operand prep on (NL, 128) planes: spherical
    flattening (surfdisp96.f:486-553), per-chain lower bound cm /
    max velocity betmx (surfdisp96.f:140-217 + gtsolh Newton), the
    dynamic-skip top row, and the walker's stacked prop planes
    ([d; a; b; rho] Rayleigh, [d; b; rho] Love — pallas_walk
    layout_t order)."""
    from bayhunter_tpu.ops.swd import gtsolh

    d, a, b, rho_w = h, vp, vs, rho
    if iflsph == 1:
        ones = jnp.ones_like(h[0:1])
        acc = jnp.zeros_like(ones)
        zt_rows, zb_rows = [], []
        for i in range(nl):
            r = h[i:i + 1] if i < nl - 1 else ones
            zt_rows.append(acc)
            acc = acc + r
            zb_rows.append(acc)
        zt = jnp.concatenate(zt_rows, axis=0)
        zb = jnp.concatenate(zb_rows, axis=0)
        r0 = SWD_EARTH_R - zt
        r1 = SWD_EARTH_R - zb
        z0 = SWD_EARTH_R * jnp.log(SWD_EARTH_R / r0)
        z1 = SWD_EARTH_R * jnp.log(SWD_EARTH_R / r1)
        d_f = z1 - z0
        tmp = (SWD_EARTH_R + SWD_EARTH_R) / (r0 + r1)
        a = vp * tmp
        b = vs * tmp
        ex = -5.0 if iwave == 1 else -2.275
        rho_w = rho * jnp.exp(ex * jnp.log(tmp))
        d = jnp.concatenate([d_f[:-1], jnp.zeros_like(d_f[:1])],
                            axis=0)

    # per-chain lower bound cm / max velocity (ops/swd.py:927-942):
    # argmin as min + first-occurrence one-hot
    solid = b > 0.01
    cand = jnp.where(solid, b, a)
    betmn = jnp.min(cand, axis=0, keepdims=True)
    idxv = jax.lax.broadcasted_iota(jnp.int32, cand.shape, 0)
    jmn = jnp.min(jnp.where(cand == betmn, idxv, nl), axis=0,
                  keepdims=True)
    at_mn = idxv == jmn
    a_mn = jnp.sum(jnp.where(at_mn, a, 0.0), axis=0, keepdims=True)
    b_mn = jnp.sum(jnp.where(at_mn, b, 0.0), axis=0, keepdims=True)
    jsol = jnp.max(jnp.where(at_mn & solid, 1.0, 0.0), axis=0,
                   keepdims=True) > 0.5
    cc1 = jnp.where(jsol, gtsolh(a_mn, b_mn), betmn)
    cm_ref[:] = 0.95 * 0.90 * cc1
    bx_ref[:] = jnp.max(b, axis=0, keepdims=True)

    idxf = idxv.astype(jnp.float32)
    top_ref[:] = jnp.max(jnp.where(d > 0.0, idxf, -1.0), axis=0,
                         keepdims=True)

    planes = [d, b, rho_w] if iwave == 1 else [d, a, b, rho_w]
    props_ref[:] = jnp.concatenate(planes, axis=0)


def _model_kernel(nl, specs, cfgt, mantle, *refs):
    vs_ref, z_ref, n_ref, vpvs_ref = refs[:4]
    outs = refs[4:]
    vs = vs_ref[:]
    z = z_ref[:]
    n_row = n_ref[:]
    vpvs_row = vpvs_ref[:]

    h, vp_l, vs_l, rho = _voronoi_rows(nl, mantle, vs, z, n_row,
                                       vpvs_row)
    valid_ref = outs[0]
    valid_ref[:] = _valid_rows(nl, cfgt, h, vs, z, n_row)

    k = 1
    for sp in specs:
        if sp[0] == 'swd':
            _swd_rows(nl, sp[1], sp[2], h, vp_l, vs_l, rho,
                      outs[k], outs[k + 1], outs[k + 2], outs[k + 3])
            k += 4
        else:
            _rf_rows(nl, sp[1], sp[2], sp[3], h, vp_l, vs_l, rho,
                     outs[k], outs[k + 1])
            k += 2


def model_operands_t(vs_t, z_t, n, vpvs, specs, cfgt, mantle=None,
                     interpret=False):
    """Unified model kernel on transposed (NL, C) nucleus arrays.

    ``specs`` is a static tuple of per-target descriptors:
      ``('swd', iwave, iflsph)``            — SWD solver operands
      ``('rf', p_skm, wave_type, flatten)`` — RF solver operands
    ``cfgt`` = (layermin, layermax, vsmin, vsmax, zmin, zmax,
    thickmin, lvz, hvz) static prior bounds; ``mantle`` the optional
    (vs_threshold, vpvs_mantle) pair.

    Returns ``(valid, results)``: a (C,) bool prior-validity vector
    and one tuple per spec — for swd ``(props, cm, bx, top)`` with
    ``props`` the ((3|4)*NL, C) stacked walker planes and cm/bx/top
    (C,) rows; for rf the ``(coefs, pack)`` pair of
    :func:`rf_operands_t`."""
    nl, C = vs_t.shape
    # small ensembles run ONE grid step with exact-C blocks (Mosaic
    # accepts a minor block dim equal to the array dim): no lane-pad
    # concats on the inputs, no trim slices on the outputs — ~16
    # top-level ops that would otherwise re-pay the per-op device
    # floor the kernel exists to remove (docs/performance.md)
    if C <= LANES:
        W, Cp = C, C
    else:
        W = LANES
        Cp = -(-C // LANES) * LANES
        if Cp != C:
            def padl(x):
                return jnp.concatenate(
                    [x, jnp.broadcast_to(x[:, :1],
                                         (x.shape[0], Cp - C))],
                    axis=1)
            vs_t, z_t = padl(vs_t), padl(z_t)
            n = jnp.concatenate(
                [n, jnp.broadcast_to(n[:1], (Cp - C,))])
            vpvs = jnp.concatenate(
                [vpvs, jnp.broadcast_to(vpvs[:1], (Cp - C,))])

    n_r = n.reshape(1, Cp).astype(jnp.int32)
    vpvs_r = vpvs.reshape(1, Cp)

    def spec_rows(r):
        return pl.BlockSpec((r, W), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    out_shape = [jax.ShapeDtypeStruct((1, Cp), jnp.float32)]
    out_specs = [spec_rows(1)]
    for sp in specs:
        if sp[0] == 'swd':
            P = 3 if sp[1] == 1 else 4
            out_shape += [
                jax.ShapeDtypeStruct((P * nl, Cp), jnp.float32),
                jax.ShapeDtypeStruct((1, Cp), jnp.float32),
                jax.ShapeDtypeStruct((1, Cp), jnp.float32),
                jax.ShapeDtypeStruct((1, Cp), jnp.float32)]
            out_specs += [spec_rows(P * nl), spec_rows(1),
                          spec_rows(1), spec_rows(1)]
        else:
            npr = pack_rows_padded(nl)
            out_shape += [
                jax.ShapeDtypeStruct(((nl - 1) * 32, Cp),
                                     jnp.float32),
                jax.ShapeDtypeStruct((npr, Cp), jnp.float32)]
            out_specs += [spec_rows((nl - 1) * 32), spec_rows(npr)]

    outs = pl.pallas_call(
        functools.partial(_model_kernel, nl, tuple(specs),
                          tuple(cfgt),
                          None if mantle is None else tuple(mantle)),
        out_shape=out_shape,
        grid=(Cp // W,),
        in_specs=[spec_rows(nl), spec_rows(nl), spec_rows(1),
                  spec_rows(1)],
        out_specs=out_specs,
        interpret=interpret,
    )(vs_t, z_t, n_r, vpvs_r)

    def trim(x):
        return x[:, :C] if Cp != C else x

    valid = trim(outs[0])[0] > 0.5
    results = []
    k = 1
    for sp in specs:
        if sp[0] == 'swd':
            results.append((trim(outs[k]), trim(outs[k + 1])[0],
                            trim(outs[k + 2])[0],
                            trim(outs[k + 3])[0]))
            k += 4
        else:
            results.append((trim(outs[k]), trim(outs[k + 1])))
            k += 2
    return valid, tuple(results)


def rf_operands_t(h, vp, vs, rho, p, wave_type=0, flattening=True,
                  interpret=False):
    """RF kernel operands from transposed (NL, C) layer planes.

    Returns ``(coefs, pack)`` in the TRANSPOSED layout —
    (640, C) and (pack_rows_padded, C) — for the caller to
    transpose once (cheap big-minor XLA transposes) and feed
    ``pallas_rf._resp_kernel`` packed mode.  ``p`` (slowness, s/km)
    is a STATIC per-target constant baked into the program.
    """
    nl, C = h.shape
    Cp = -(-C // LANES) * LANES
    if Cp != C:
        def padl(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[:, :1], (nl, Cp - C))],
                axis=1)
        h, vp, vs, rho = (padl(x) for x in (h, vp, vs, rho))

    def spec_in():
        return pl.BlockSpec((nl, LANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    npr = pack_rows_padded(nl)
    coefs, pack = pl.pallas_call(
        functools.partial(_prep_kernel, nl, float(p),
                          int(wave_type), bool(flattening)),
        out_shape=[
            jax.ShapeDtypeStruct(((nl - 1) * 32, Cp), jnp.float32),
            jax.ShapeDtypeStruct((npr, Cp), jnp.float32)],
        grid=(Cp // LANES,),
        in_specs=[spec_in()] * 4,
        out_specs=[
            pl.BlockSpec(((nl - 1) * 32, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((npr, LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM)],
        interpret=interpret,
    )(h, vp, vs, rho)
    return coefs[:, :C], pack[:, :C]
