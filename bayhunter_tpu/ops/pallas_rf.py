"""Pallas TPU kernel for the reflectivity transmission response.

Computes the per-frequency (cz, cr) plane-wave responses of
ops/rf.py:_transmission_response — the hot loop of the receiver-
function forward model — with the whole layer recursion resident in
VMEM.  Complex arithmetic is carried as explicit (re, im) float pairs;
the chain batch is tiled 8 rows per program with the frequency axis on
the 128-wide lanes.

Deconvolution, Z/R->P/SV decomposition and the inverse FFT stay in XLA
(ops/rf.py) — they are cheap and fuse well.
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Dynamic layer-count skip — see the rationale note in
# ops/pallas_secular.py.  Three modes, mirroring the secular kernel:
#   None      full unrolled layer loop
#   'branch'  per-layer lax.cond on the tile's deepest active layer
#   'loop'    ONE dynamic-trip fori_loop 1..top; per-layer properties
#             and XLA-precomputed interface coefficients ride a
#             layer-major (1, NL, 8, 40) VMEM block so the loop can
#             index the MAJOR dim (Mosaic rejects dynamic lane-dim
#             vector loads, pallas_secular._dyn_col).
# Measured on a real v5e at 10240 chains (scripts/bench_rf_parts.py,
# ~7 active of 21 layers): full loop 5.11 ms/call, branch 4.26,
# loop 6.57.  UNLIKE the secular kernel (where loop won 2x), the RF
# recursion's fori carry is 40 (8, 128) vregs — the per-iteration
# carry spill dwarfs the skipped-layer work, while the secular carry
# is 5 vregs.  'branch' is therefore the production default here;
# 'loop' is kept as a measured A/B arm.
_DYN_ENV = os.environ.get(
    'BAYHUNTER_DYNAMIC_NL_RF',
    os.environ.get('BAYHUNTER_DYNAMIC_NL', 'branch'))
DYNAMIC_NL = {'0': None, '1': 'branch', 'branch': 'branch',
              'loop': 'loop'}.get(_DYN_ENV)

# Chains per program tile.  16 beats the original 8 by +6.7%
# END-TO-END at the 10,240-chain bench config (1.918M vs 1.827M
# proposals/s, same-session normalizer-adjusted, 2026-08-20): the
# per-tile fixed work — (1, F) frequency-constant builds and the
# (C_TILE, 1) per-chain scalars — amortizes over twice the chains,
# and resorted tiles stay depth-homogeneous enough that the coarser
# dynamic-skip granularity (tile-max layer count over 16 chains)
# costs less than the amortization buys.  64 wins the ISOLATED kernel
# microbench by 38% on unsorted random models but only +1% end-to-end
# (sorted production tiles lose more skip granularity); 128 regresses
# outright (VMEM carry pressure).
from bayhunter_tpu.ops.pallas_secular import _parse_ctile

C_TILE = _parse_ctile('BAYHUNTER_RF_CTILE', '16')

# Hoist the remaining per-chain frequency-independent scalars (direct-
# arrival alignment time t0, free-surface displacement matrix hmat,
# free-surface reflection nt) out of the kernel into one flat-
# vectorized XLA computation, like the interface coefficients: in-
# kernel they cost ~120 (C_TILE, 1)-shaped VPU ops per tile, each
# wasting 127/128 lanes.  =0 restores the in-kernel computation (A/B
# + parity tests).
SCAL_XLA = os.environ.get('BAYHUNTER_RF_SCAL_XLA', '1') == '1'


# ----------------------------------------------------------------------
# complex helpers on (re, im) pairs
# ----------------------------------------------------------------------

def _cmul(a, b):
    return (a[0] * b[0] - a[1] * b[1], a[0] * b[1] + a[1] * b[0])


def _cadd(a, b):
    return (a[0] + b[0], a[1] + b[1])


def _csub(a, b):
    return (a[0] - b[0], a[1] - b[1])


def _cscale(s, a):
    return (s * a[0], s * a[1])


def _cinv(a):
    d = a[0] * a[0] + a[1] * a[1]
    return (a[0] / d, -a[1] / d)


def _cdiv(a, b):
    return _cmul(a, _cinv(b))


def _csqrt(a):
    """Principal complex square root of an (re, im) pair."""
    r = jnp.sqrt(a[0] * a[0] + a[1] * a[1])
    re = jnp.sqrt(jnp.maximum(0.5 * (r + a[0]), 0.0))
    im_mag = jnp.sqrt(jnp.maximum(0.5 * (r - a[0]), 0.0))
    im = jnp.where(a[1] < 0.0, -im_mag, im_mag)
    return (re, im)


def _cexp(a):
    """exp of an (re, im) pair."""
    m = jnp.exp(a[0])
    return (m * jnp.cos(a[1]), m * jnp.sin(a[1]))


def _csqrt_conj_real(x):
    """conj(sqrt(complex(x))) for REAL x (interface coefficients use
    the conjugated branch; ops/rf.py:_csqrt_conj)."""
    xp = jnp.sqrt(jnp.maximum(x, 0.0))
    xn = jnp.sqrt(jnp.maximum(-x, 0.0))
    return (xp, -xn)


def _csqrt_plain_real(x):
    xp = jnp.sqrt(jnp.maximum(x, 0.0))
    xn = jnp.sqrt(jnp.maximum(-x, 0.0))
    return (xp, xn)


# 2x2 complex matrices as 4-tuples of (re, im) pairs: (m11,m12,m21,m22)

def _m4mul(A, B):
    a11, a12, a21, a22 = A
    b11, b12, b21, b22 = B
    return (_cadd(_cmul(a11, b11), _cmul(a12, b21)),
            _cadd(_cmul(a11, b12), _cmul(a12, b22)),
            _cadd(_cmul(a21, b11), _cmul(a22, b21)),
            _cadd(_cmul(a21, b12), _cmul(a22, b22)))


def _m4inv_of_eye_minus(K):
    """inv(I - K) for a 2x2 complex K."""
    k11, k12, k21, k22 = K
    m11 = (1.0 - k11[0], -k11[1])
    m12 = (-k12[0], -k12[1])
    m21 = (-k21[0], -k21[1])
    m22 = (1.0 - k22[0], -k22[1])
    det = _csub(_cmul(m11, m22), _cmul(m12, m21))
    idet = _cinv(det)
    return (_cmul(m22, idet), _cmul((-m12[0], -m12[1]), idet),
            _cmul((-m21[0], -m21[1]), idet), _cmul(m11, idet))


# ----------------------------------------------------------------------
# interface / surface coefficients (per-chain scalars, (C_TILE, 1))
# ----------------------------------------------------------------------

def _interface_coeffs(p, vp1, vs1, rho1, vp2, vs2, rho2):
    """P-SV R/T matrices of a welded interface (ops/rf.py:91-151).

    All inputs are real (C_TILE, 1) arrays; outputs are 2x2 complex
    matrices as 4-tuples of (re, im) pairs in (m11, m12, m21, m22)
    order matching ops/rf.py's _mat(rpp, rsp, rps, rss) layout.
    """
    def R(x):  # lift a real array to an (re, im) pair
        return (x, jnp.zeros_like(x))

    mue1 = rho1 * vs1 * vs1
    mue2 = rho2 * vs2 * vs2
    c = 2.0 * (mue1 - mue2)
    u2 = p * p
    cu2 = c * u2
    a1 = _csqrt_conj_real(1.0 / (vp1 * vp1) - u2)
    a2 = _csqrt_conj_real(1.0 / (vp2 * vp2) - u2)
    b1 = _csqrt_conj_real(1.0 / (vs1 * vs1) - u2)
    b2 = _csqrt_conj_real(1.0 / (vs2 * vs2) - u2)

    t1 = cu2 - rho1 + rho2
    t2 = cu2 - rho1
    t3 = cu2 + rho2
    t4 = _csub(_cscale(t3, a1), _cscale(t2, a2))

    a1b1 = _cmul(a1, b1)
    a2b2 = _cmul(a2, b2)
    a1b2 = _cmul(a1, b2)
    a2b1 = _cmul(a2, b1)
    abab = _cmul(a1b1, a2b2)
    tb = _csub(_cscale(t3, b1), _cscale(t2, b2))  # t3 b1 - t2 b2

    def table(d1, d2, rho_i, aa, bb, cross, mix_a, mix_b, rss_sign):
        """One R/T table; mirrors the downgoing block of ops/rf.py
        with (aa, bb) the incident-side slownesses."""
        t5 = _cinv(_cadd(d1, d2))
        t7 = _cscale(2.0 * rho_i, t5)
        rpp = _cmul(_csub(d2, d1), t5)
        rps_core = _cmul(t5, cross)
        rpp_like = _cmul(aa, rps_core)
        rsp_like = _cmul(bb, rps_core)
        tpp = _cmul(aa, _cmul(t7, tb))
        tps = _cmul(aa, _cmul(t7, _cadd(R(t1), _cscale(c, mix_a))))
        rss = _cmul(_csub(_csub(d2, d1),
                          _cscale(rss_sign * 2.0 * rho1 * rho2,
                                  _csub(a1b2, a2b1))), t5)
        tss = _cmul(bb, _cmul(t7, t4))
        tsp = _cmul(bb, _cmul(t7, _cadd(R(t1), _cscale(c, mix_b))))
        return rpp, rpp_like, rsp_like, tpp, tps, rss, tss, tsp

    # downgoing incident (table 1): d-terms use the lower medium's
    # slowness products against the upper medium's
    d1d = _cadd(_cadd(R(t1 * t1 * u2), _cscale(t2 * t2, a2b2)),
                _cscale(rho1 * rho2, a2b1))
    d2d = _cadd(_cadd(_cscale(c * c * u2, abab),
                      _cscale(t3 * t3, a1b1)),
                _cscale(rho1 * rho2, a1b2))
    cross_d = _cadd(R(t1 * t3), _cscale(c * t2, a2b2))
    (rpp, rps_c, rsp_c, tpp, tps_c, rss, tss,
     tsp_c) = table(d1d, d2d, rho1, a1, b1, cross_d, a2b1, a1b2, 1.0)
    rd = (rpp, _cscale(2.0 * p, rsp_c), _cscale(-2.0 * p, rps_c), rss)
    td = (tpp, _cscale(p, tsp_c), _cscale(-p, tps_c), tss)

    # upgoing incident (table 2): media roles swapped
    d1u = _cadd(_cadd(R(t1 * t1 * u2), _cscale(t3 * t3, a1b1)),
                _cscale(rho1 * rho2, a1b2))
    d2u = _cadd(_cadd(_cscale(c * c * u2, abab),
                      _cscale(t2 * t2, a2b2)),
                _cscale(rho1 * rho2, a2b1))
    cross_u = _cadd(R(t1 * t2), _cscale(c * t3, a1b1))
    (rpp, rps_c, rsp_c, tpp, tps_c, rss, tss,
     tsp_c) = table(d1u, d2u, rho2, a2, b2, cross_u, a1b2, a2b1, -1.0)
    ru = (rpp, _cscale(-2.0 * p, rsp_c), _cscale(2.0 * p, rps_c), rss)
    tu = (tpp, _cscale(p, tsp_c), _cscale(-p, tps_c), tss)
    return rd, td, ru, tu


def _free_surface(p, vp, vs):
    """Free-surface reflection for upgoing waves (plain sqrt branch;
    ops/rf.py:170-189)."""
    u2 = p * p
    a = _csqrt_plain_real(1.0 / (vp * vp) - u2)
    b = _csqrt_plain_real(1.0 / (vs * vs) - u2)
    t1 = 2.0 * vs * vs
    t2 = t1 * u2 - 1.0
    d = _cadd((t2 * t2, jnp.zeros_like(p)),
              _cscale(t1 * t1 * u2, _cmul(a, b)))
    t3 = _cdiv((2.0 * t1 * p * t2, jnp.zeros_like(p)), d)
    rpp = _cdiv(_csub(_cscale(t1 * t1 * u2, _cmul(a, b)),
                      (t2 * t2, jnp.zeros_like(p))), d)
    rsp = _cscale(-1.0, _cmul(b, t3))
    rps = _cmul(a, t3)
    return (rpp, rsp, rps, rpp)


def _displacement(p, vp, vs):
    """Free-surface displacement matrix (ops/rf.py:192-205)."""
    vp2 = vp * vp
    vs2 = vs * vs
    p2 = p * p
    x = 1.0 - 2.0 * vs2 * p2
    a1 = _csqrt_conj_real(1.0 / vp2 - p2)
    b1 = _csqrt_conj_real(1.0 / vs2 - p2)
    q = _cinv(_cadd((x * x, jnp.zeros_like(p)),
                    _cscale(4.0 * vs2 * vs2 * p2, _cmul(a1, b1))))
    ab = _cmul(a1, b1)
    return (_cscale(2.0 * vs2, _cmul(q, _cscale(p, ab))),
            _cscale(x, _cmul(q, b1)),
            _cscale(x, _cmul(q, a1)),
            _cscale(-2.0 * vs2, _cmul(q, _cscale(p, ab))))


# ----------------------------------------------------------------------
# the kernel
# ----------------------------------------------------------------------

class _ColView:
    """Column-offset view over the packed per-chain operand block
    (transposed-layout path): ``view[:, i:i+1]`` reads the underlying
    ref at column offset ``off + i`` — so the kernel body's existing
    ``x_ref[:, l:l+1]`` reads work unchanged against one combined
    (C_TILE, width) block."""

    def __init__(self, ref, off):
        self.ref = ref
        self.off = off

    def __getitem__(self, idx):
        _, cols = idx
        return self.ref[:, cols.start + self.off:
                        cols.stop + self.off]


def _resp_kernel(nl, nsamp, fsamp, wave_type, fref, nfreq, dynamic,
                 coeff_xla, q_const, scal_xla, packed, *refs):
    if dynamic:
        top_ref, *refs = refs
    else:
        top_ref = None
    props_ref = None
    if dynamic == 'loop':
        props_ref, *refs = refs
        coef_ref = None
    elif coeff_xla:
        coef_ref, *refs = refs
    else:
        coef_ref = None
    if packed:
        # ONE (C_TILE, 3*NL+18) per-chain block carries
        # [h | vp | vs | p | scal(17)]; rho/qp/qs are never read in
        # this mode (coefficients precomputed, uniform Q)
        pack_ref, czr_ref, czi_ref, crr_ref, cri_ref = refs
        h_ref = _ColView(pack_ref, 0)
        vp_ref = _ColView(pack_ref, nl)
        vs_ref = _ColView(pack_ref, 2 * nl)
        p_ref = _ColView(pack_ref, 3 * nl)
        scal_ref = _ColView(pack_ref, 3 * nl + 1)
        rho_ref = qp_ref = qs_ref = None
    else:
        scal_ref = None
        if scal_xla:
            scal_ref, *refs = refs
        (h_ref, vp_ref, vs_ref, rho_ref, qp_ref, qs_ref, p_ref,
         czr_ref, czi_ref, crr_ref, cri_ref) = refs
    F = czr_ref.shape[-1]
    p = p_ref[:, 0:1]                                   # (8, 1)

    # frequency lanes (padded tail clamps to the last real frequency);
    # TPU iota must be integer-typed
    jf = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    jf = jnp.minimum(jf, nfreq - 1).astype(jnp.float32)
    dw = 2.0 * jnp.pi * fsamp / nsamp
    w = dw * jf                                         # (1, F)
    wref = 2.0 * jnp.pi * fref
    lgw = jnp.where(jf > 0, jnp.log(jnp.maximum(w, 1e-30) / wref), 0.0)

    if scal_ref is not None:
        # per-chain frequency-independent scalars precomputed in XLA
        # (chain_scalars_xla): [t0, hmat x8, nt x8]
        def _sc(k):
            return scal_ref[:, k:k + 1]
        t0 = _sc(0)
        hmat = tuple((_sc(1 + 2 * m), _sc(2 + 2 * m)) for m in range(4))
        nt_surf = tuple((_sc(9 + 2 * m), _sc(10 + 2 * m))
                        for m in range(4))
    else:
        # direct-wave alignment time (halfspace h = -1 sentinel)
        t0 = jnp.zeros_like(p)
        for i in range(nl):
            v = vp_ref[:, i:i + 1] if wave_type == 0 \
                else vs_ref[:, i:i + 1]
            qv = jnp.sqrt(jnp.maximum(1.0 / (v * v) - p * p, 0.0))
            t0 = t0 + (-1.0 if i == nl - 1 else 1.0) \
                * (1.0 if i == nl - 1 else h_ref[:, i:i + 1]) * qv
        # (the halfspace contributes -1 * qv exactly as the h=-1
        # sentinel)
        hmat = _displacement(p, vp_ref[:, 0:1], vs_ref[:, 0:1])
        nt_surf = None

    if q_const is not None:
        # UNIFORM-Q hoist: with one Q per wave type shared by every
        # layer and chain (the production default — the plugin's
        # Qp=500/Qs=225), the anelastic complex-velocity factor
        # vc = v*u(w), u = 1 + lgw/(pi Q) + i/2Q depends on frequency
        # only, so 1/u^2 is ONE shared (1, F) complex vector instead
        # of a per-layer vc build + complex square + inversion
        # (~30 (8, F) VPU ops per layer).  qc = sqrt((1/v^2)(1/u^2)
        # - p^2) — algebraically identical, f32-rounding-level
        # different (op order), parity-tested against the array-Q
        # path.
        def _iu2(qf):
            u = (1.0 + lgw / (jnp.pi * qf),
                 jnp.full_like(lgw, 0.5 / qf))
            return _cinv(_cmul(u, u))                   # (1, F)
        iu2_p = _iu2(jnp.float32(q_const[0]))
        iu2_s = _iu2(jnp.float32(q_const[1]))

    def _phase_pair(vp_l, vs_l, h_l, qp_l, qs_l):
        """Anelastic phase terms e1/e2 = exp(-i w h q_{p,s})."""
        if q_const is not None:
            def phase_c(v, iu2_v):
                r = 1.0 / (v * v)                       # (8, 1)
                qc = _csqrt((iu2_v[0] * r - p * p, iu2_v[1] * r))
                arg = (w * h_l * qc[1], -w * h_l * qc[0])
                return _cexp(arg)
            return phase_c(vp_l, iu2_p), phase_c(vs_l, iu2_s)

        def phase(v, qf):
            vc = (v * (1.0 + lgw / (jnp.pi * qf)), v * (0.5 / qf))
            iv2 = _cinv(_cmul(vc, vc))
            qc = _csqrt((iv2[0] - p * p, iv2[1]))
            arg = (w * h_l * qc[1], -w * h_l * qc[0])   # -i w h qc
            return _cexp(arg)
        return phase(vp_l, qp_l), phase(vs_l, qs_l)

    def layer_parts(i):
        """Interface coefficients and phase terms of layer i.

        The coefficients are frequency-INDEPENDENT per-chain scalars:
        computing them in-kernel costs ~600 (C_TILE, 1)-shaped VPU
        ops per layer — each wasting 127/128 lanes — which an
        ablation measured as ~98% of this kernel's per-call compute
        (slope 0.261 -> 0.005 ms/call at 512 chains with them
        replaced by constants).  They are therefore precomputed in
        XLA (vectorized over chains x layers, `interface_coeffs_xla`)
        and read here as packed per-layer loads; the in-kernel
        fallback remains for A/B (BAYHUNTER_RF_COEFF_XLA=0).

        In 'loop' mode ``i`` may be a TRACED scalar: every per-layer
        quantity is loaded from the layer-major props block (dynamic
        MAJOR-dim indexing), lanes [h, vp, vs, qp, qs, pad x3,
        32 coeff components]."""
        if props_ref is not None:
            row = props_ref[0, i]                       # (8, 40)
            h_l = row[:, 0:1]
            vp_l = row[:, 1:2]
            vs_l = row[:, 2:3]
            qp_l = row[:, 3:4]
            qs_l = row[:, 4:5]

            def cf(m, e, c):
                k = 8 + m * 8 + e * 2 + c
                return row[:, k:k + 1]
            coeffs = tuple(
                tuple((cf(m, e, 0), cf(m, e, 1)) for e in range(4))
                for m in range(4))
            e1, e2 = _phase_pair(vp_l, vs_l, h_l, qp_l, qs_l)
            return coeffs, e1, e2
        vp_l = vp_ref[:, i:i + 1]
        vs_l = vs_ref[:, i:i + 1]
        h_l = h_ref[:, i:i + 1]
        # packed (transposed-layout) blocks carry no Q columns — the
        # uniform-Q phase hoist never reads them
        qp_l = None if qp_ref is None else qp_ref[:, i:i + 1]
        qs_l = None if qs_ref is None else qs_ref[:, i:i + 1]
        if coef_ref is not None:
            def cf(m, e, c):
                k = i * 32 + m * 8 + e * 2 + c
                return coef_ref[:, k:k + 1]
            coeffs = tuple(
                tuple((cf(m, e, 0), cf(m, e, 1)) for e in range(4))
                for m in range(4))
        else:
            coeffs = _interface_coeffs(
                p, vp_l, vs_l, rho_ref[:, i:i + 1],
                vp_ref[:, i + 1:i + 2], vs_ref[:, i + 1:i + 2],
                rho_ref[:, i + 1:i + 2])
        e1, e2 = _phase_pair(vp_l, vs_l, h_l, qp_l, qs_l)
        return coeffs, e1, e2

    def layer_step(i, carry):
        """Layers 1..nl-2: advance (x = nb q, g, ru, td_prev).

        ``nb`` and ``q`` are only ever consumed via their product, so
        the recursion carries x = nb q instead — same multiply count
        (one m4mul moves from nt to x), but the lax.cond / fori carry
        shrinks from 24 to 16 (8, F) arrays, which is where the
        dynamic-skip overhead lives (see the mode note at the top)."""
        x, g, ru, td_prev = carry
        (rd_next, td_i, ru_next, tu_next), e1, e2 = layer_parts(i)

        # nt = ru + td_i-1 (nb q)
        t = _m4mul(td_prev, x)
        nt = tuple(_cadd(a, b) for a, b in zip(ru, t))

        # nb = e nt e (diagonal phase sandwich)
        e11 = _cmul(e1, e1)
        e12 = _cmul(e1, e2)
        e22 = _cmul(e2, e2)
        nb = (_cmul(nt[0], e11), _cmul(nt[1], e12),
              _cmul(nt[2], e12), _cmul(nt[3], e22))

        # q = inv(I - rd_{i+1} nb) tu_{i+1}
        K = _m4mul(rd_next, nb)
        q = _m4mul(_m4inv_of_eye_minus(K), tu_next)

        # g = g (e q)
        eq = (_cmul(e1, q[0]), _cmul(e1, q[1]),
              _cmul(e2, q[2]), _cmul(e2, q[3]))
        return _m4mul(nb, q), _m4mul(g, eq), ru_next, td_i

    # layer 0 (free surface on top) always runs: n >= 2 guarantees a
    # real surface layer
    (rd_next, td_i, ru_next, tu_next), e1, e2 = layer_parts(0)
    nt = nt_surf if nt_surf is not None \
        else _free_surface(p, vp_ref[:, 0:1], vs_ref[:, 0:1])
    e11 = _cmul(e1, e1)
    e12 = _cmul(e1, e2)
    e22 = _cmul(e2, e2)
    nb = (_cmul(nt[0], e11), _cmul(nt[1], e12),
          _cmul(nt[2], e12), _cmul(nt[3], e22))
    K = _m4mul(rd_next, nb)
    q = _m4mul(_m4inv_of_eye_minus(K), tu_next)
    g = (_cmul(e1, q[0]), _cmul(e1, q[1]),
         _cmul(e2, q[2]), _cmul(e2, q[3]))
    carry = (_m4mul(nb, q), g, ru_next, td_i)

    # deeper layers: skippable per tile once inside the padding region
    # (identical media, zero thickness -> rd=0, tu=I, e=1: g invariant)
    if top_ref is None:
        for i in range(1, nl - 1):
            carry = layer_step(i, carry)
    elif dynamic == 'loop':
        top = jnp.minimum(top_ref[0, pl.program_id(0)], nl - 2)
        carry = jax.lax.fori_loop(1, top + 1, layer_step, carry)
    else:
        # 'branch': one lax.cond per BLOCK of layers, not per layer —
        # the cond's carry save/restore costs about half a layer's
        # compute (measured: full 20-layer loop 5.11 ms vs 4.26 for
        # per-layer conds over ~7 active layers at 10240 chains), so
        # per-layer predication loses most of the skip.  Padded-slot
        # updates are EXACT identities for this kernel (rd=0, tu=I,
        # e=1 — see the skip-invariance note in ops/rf.py), so a
        # block may over-execute up to block-1 identity layers: the
        # block runs iff its FIRST layer is active.
        # BAYHUNTER_RF_BLOCK accepts a comma SCHEDULE ("4,2,2": block
        # widths from the surface down, last width repeats) so the
        # boundaries can straddle the model-size distribution: a
        # birth proposal whose extra layer crosses a uniform block-4
        # boundary over-executes up to 3 identity layers, and those
        # tiles sit exactly where the posterior mass is (5-8 active
        # of 21 slots).  A single integer keeps the uniform width.
        sched = [max(1, int(w)) for w in
                 os.environ.get('BAYHUNTER_RF_BLOCK', '4').split(',')
                 if w.strip()] or [4]
        top = top_ref[0, pl.program_id(0)]
        blocks = []
        b, nblk = 1, 0
        while b < nl - 1:
            blk = sched[min(nblk, len(sched) - 1)]
            nblk += 1
            hi = min(b + blk, nl - 1)
            blocks.append((b, hi))
            b = hi
        for b, hi in blocks:
            def run_block(c, b=b, hi=hi):
                for i in range(b, hi):
                    c = layer_step(i, c)
                return c
            carry = jax.lax.cond(b <= top, run_block,
                                 lambda c: c, carry)

    col = 0 if wave_type == 0 else 1
    g = carry[1]
    # t = 2 h g ; pick the column of the incident wave
    t_full = _m4mul(hmat, g)
    cr = _cscale(2.0, t_full[0 + col])      # row 0
    cz = _cscale(2.0, t_full[2 + col])      # row 1

    # alignment phase exp(+i w t0)
    qq = _cexp((jnp.zeros_like(w * t0), w * t0))
    cz = _cmul(cz, qq)
    cr = _cmul(cr, qq)

    czr_ref[:] = cz[0]
    czi_ref[:] = cz[1]
    crr_ref[:] = cr[0]
    cri_ref[:] = cr[1]


def interface_coeffs_xla(p, vp, vs, rho):
    """All welded-interface R/T coefficient tables of a layer stack,
    vectorized over (C, NL-1) in XLA.

    Returns (C, (NL-1)*32) float32: per layer i the 4 matrices
    (rd, td, ru, tu) x 4 entries x (re, im), laid out so the kernel
    reads entry (i, m, e, c) at lane i*32 + m*8 + e*2 + c.  The
    coefficients are frequency-independent, so hoisting them out of
    the frequency-lane kernel turns ~600 (8, 1)-shaped VPU ops per
    layer into one dense (C, NL-1)-vectorized computation plus VMEM
    loads (measured: they were ~98% of the kernel's per-call
    compute).

    The computation runs on FLAT (C*(NL-1),) arrays: a (C, NL-1)
    f32 array tiles as T(8, 128) with the 20-wide minor dim padded to
    128 lanes, so every elementwise op of the ~600-op chain would
    waste 6/7 of the VPU (measured 0.74 ms of a 7.9 ms vs-step at
    10240 chains — the single largest non-pallas item).  Flat 1-D
    arrays tile full lanes; an optimization barrier keeps XLA from
    folding the relayout back into the padded-layout consumers."""
    C, nl = vp.shape

    def flat(x):
        return x.reshape(C * (nl - 1))
    args = (jnp.broadcast_to(p[:, None], (C, nl - 1)),
            vp[:, :-1], vs[:, :-1], rho[:, :-1],
            vp[:, 1:], vs[:, 1:], rho[:, 1:])
    args = jax.lax.optimization_barrier(
        tuple(flat(a) for a in args))
    mats = _interface_coeffs(*args)            # 4 x 4 x (re, im)
    comps = []
    for mat in mats:
        for entry in mat:
            comps.append(jnp.broadcast_to(entry[0], (C * (nl - 1),)))
            comps.append(jnp.broadcast_to(entry[1], (C * (nl - 1),)))
    comps = jax.lax.optimization_barrier(tuple(comps))
    # (C, NL-1, 32) -> (C, (NL-1)*32) with layer-major lanes.
    # (Component-major lanes — a relayout-free pack — were tried and
    # adjudicated 18% SLOWER on-chip: scattered in-kernel VMEM loads
    # cost more than the one relayout copy; docs/performance.md.)
    # The pack itself is ONE component-axis stack + ONE transpose
    # copy: the earlier per-component ``c.reshape(C, nl-1)`` stack
    # emitted 32 reshapes + 32 copies at the XLA top level (65 ops x
    # the ~µs per-op device floor was the single largest step-tail
    # source, scripts/attr_step_tail.py round-4).  Bit-identical
    # output: stack[e, c, l] -> transpose(1, 2, 0)[c, l, e] is the
    # same element order as the old axis=-1 stack.
    packed = jnp.stack(comps, axis=0).reshape(32, C, nl - 1)
    packed = packed.transpose(1, 2, 0).astype(jnp.float32)
    return packed.reshape(C, (nl - 1) * 32)


def chain_scalars_xla(p, h, vp, vs, wave_type):
    """Per-chain frequency-independent kernel scalars, vectorized in
    XLA: [t0, hmat(8), nt(8)] packed as (C, 24) float32 (cols 17-23
    pad).  t0 is the direct-arrival alignment time; hmat the free-
    surface displacement matrix (Mueller eq. 89); nt the free-surface
    P-SV reflection.  In-kernel these cost ~120 (C_TILE, 1)-shaped
    VPU ops per tile, each wasting 127/128 lanes."""
    C, nl = h.shape
    v = vp if wave_type == 0 else vs
    qv = jnp.sqrt(jnp.maximum(1.0 / (v * v) - (p * p)[:, None], 0.0))
    sgn_h = jnp.concatenate(
        [h[:, :-1], -jnp.ones((C, 1), h.dtype)], axis=1)
    t0 = jnp.sum(sgn_h * qv, axis=1)

    vp0, vs0 = vp[:, 0], vs[:, 0]
    hmat = _displacement(p, vp0, vs0)
    nt = _free_surface(p, vp0, vs0)
    cols = [t0]
    for m in hmat:
        cols.extend(m)
    for m in nt:
        cols.extend(m)
    cols.extend([jnp.zeros_like(t0)] * 7)
    return jnp.stack(cols, axis=-1).astype(jnp.float32)


def interface_coeffs_xla_t(p, vp, vs, rho):
    """:func:`interface_coeffs_xla` on transposed (NL, C) layer
    arrays: the (NL-1, C) elementwise chain is full-lane NATIVELY
    (chains ride the 128-wide axis), so no flat reshapes or
    optimization-barrier fences are needed, and the pack is one
    component-axis stack + one transpose copy.  Identical output
    layout: (C, (NL-1)*32), entry (i, m, e, c) at lane
    i*32 + m*8 + e*2 + c."""
    nl, C = vp.shape
    args = (jnp.broadcast_to(p[None, :], (nl - 1, C)),
            vp[:-1], vs[:-1], rho[:-1], vp[1:], vs[1:], rho[1:])
    mats = _interface_coeffs(*args)            # 4 x 4 x (re, im)
    comps = []
    for mat in mats:
        for entry in mat:
            comps.append(jnp.broadcast_to(entry[0], (nl - 1, C)))
            comps.append(jnp.broadcast_to(entry[1], (nl - 1, C)))
    # barrier between the ~600-op coefficient math and the pack:
    # without it XLA roots the WHOLE chain in the 32-way concatenate
    # fusion, which runs ~10x slower than math + concat separately
    # (measured 0.73 ms vs 0.04 ms for the bare concat on-chip)
    comps = jax.lax.optimization_barrier(tuple(comps))
    packed = jnp.stack(comps, axis=0)          # (32, NL-1, C)
    packed = packed.transpose(2, 1, 0).astype(jnp.float32)
    return packed.reshape(C, (nl - 1) * 32)


def chain_scalars_xla_t(p, h, vp, vs, wave_type):
    """:func:`chain_scalars_xla` on transposed (NL, C) layer arrays,
    returned as 17 ROWS (17, C) [t0, hmat x8, nt x8] so the caller
    can fold them into the single packed-operand concatenate."""
    nl, C = h.shape
    v = vp if wave_type == 0 else vs
    qv = jnp.sqrt(jnp.maximum(1.0 / (v * v) - (p * p)[None, :], 0.0))
    sgn_h = jnp.concatenate(
        [h[:-1], -jnp.ones((1, C), h.dtype)], axis=0)
    t0 = jnp.sum(sgn_h * qv, axis=0)
    vp0, vs0 = vp[0], vs[0]
    hmat = _displacement(p, vp0, vs0)
    nt = _free_surface(p, vp0, vs0)
    rows = [t0]
    for m in hmat:
        rows.extend(m)
    for m in nt:
        rows.extend(m)
    # barrier: keep the scalar math out of the pack concatenate's
    # fusion (see interface_coeffs_xla_t)
    rows = jax.lax.optimization_barrier(tuple(rows))
    return jnp.stack(rows, axis=0).astype(jnp.float32)   # (17, C)


def transmission_response_pallas(h, vp, vs, rho, qp, qs, p, nsamp,
                                 fsamp, wave_type=0, fref=1.0,
                                 nfreq_out=None, layout_t=False,
                                 prep=None, interpret=False):
    """Batched (cz, cr) transmission responses.

    h/vp/vs/rho/qp/qs : (C, NL) FLATTENED layer arrays (halfspace last)
    p                 : (C,) slowness in s/km
    Returns complex64 (cz, cr) of shape (C, nfreq).

    ``nfreq_out`` restricts the computed frequency lanes to the first
    nfreq_out (< nsamp//2+1) — used by synrf_batch to skip lanes the
    Gauss low-pass makes negligible.
    """
    if prep is not None and h is None:
        # unified-model-kernel callers ship no layer planes at all;
        # the packed driver below reads only the prep operands
        C = prep[0].shape[1]
        nl = prep[0].shape[0] // 32 + 1
    else:
        C, nl = (h.shape[1], h.shape[0]) if layout_t else h.shape
    nfreq = nsamp // 2 + 1
    if nfreq_out is not None:
        nfreq = min(nfreq, int(nfreq_out))
    F = max(128, -(-nfreq // 128) * 128)

    # scalar qp/qs (uniform Q) enable the shared-phase-factor kernel
    # specialization (see _resp_kernel); BAYHUNTER_RF_QCONST=0 keeps
    # the per-layer computation for A/B
    q_const = None
    if (isinstance(qp, (int, float)) and isinstance(qs, (int, float))
            and os.environ.get('BAYHUNTER_RF_QCONST', '1') == '1'):
        q_const = (float(qp), float(qs))

    dyn = 'branch' if DYNAMIC_NL is True else DYNAMIC_NL
    coeff_xla = os.environ.get('BAYHUNTER_RF_COEFF_XLA', '1') == '1'
    # transposed-layout packed path: requires the production kernel
    # configuration (uniform Q + XLA coefficients/scalars, not the
    # loop-mode props block); anything else transposes back up front
    packed = (layout_t and q_const is not None and coeff_xla
              and SCAL_XLA and dyn != 'loop')
    if prep is not None and not packed:
        raise ValueError('prep operands supplied but the packed '
                         'kernel configuration is not active')
    if layout_t and not packed:
        h, vp, vs, rho = (x.T for x in (h, vp, vs, rho))
        layout_t = False

    if packed:
        return _resp_packed_t(h, vp, vs, rho, p, nl, C, nsamp, fsamp,
                              wave_type, fref, nfreq, F, dyn, q_const,
                              interpret, prep=prep)

    if isinstance(qp, (int, float)):
        qp = jnp.full((C, nl), float(qp), jnp.float32)
    if isinstance(qs, (int, float)):
        qs = jnp.full((C, nl), float(qs), jnp.float32)

    Cp = -(-C // C_TILE) * C_TILE
    def padc(x):
        if Cp == C:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (Cp - C,) + x.shape[1:])],
            axis=0)

    args = [padc(jnp.asarray(x, jnp.float32))
            for x in (h, vp, vs, rho, qp, qs)]
    args.append(padc(jnp.asarray(p, jnp.float32)[:, None]))

    def spec(width):
        return pl.BlockSpec((C_TILE, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec(nl)] * 6 + [spec(1)]
    # named handles to the padded base arrays — the insert-at-0 logic
    # below must not disturb positional references
    h_a, vp_a, vs_a, rho_a, qp_a, qs_a, p_a = args

    scal_xla = SCAL_XLA
    if scal_xla:
        scal = chain_scalars_xla(p_a[:, 0], h_a, vp_a, vs_a,
                                 wave_type)
        args.insert(0, scal)
        in_specs.insert(0, spec(24))

    if dyn == 'loop' and not coeff_xla:
        dyn = 'branch'   # the loop path reads XLA-packed coefficients
    if dyn == 'loop':
        # layer-major props block: lanes [h, vp, vs, qp, qs, pad x3,
        # 32 interface-coefficient components], rows = layers, so the
        # in-kernel dynamic-trip loop indexes the MAJOR dim only
        coefs = interface_coeffs_xla(p_a[:, 0], vp_a, vs_a,
                                     rho_a)                 # (Cp, (nl-1)*32)
        cf = jnp.concatenate(
            [coefs.reshape(Cp, nl - 1, 32),
             jnp.zeros((Cp, 1, 32), jnp.float32)], axis=1)  # (Cp, nl, 32)
        base = jnp.stack([h_a, vp_a, vs_a, qp_a, qs_a],
                         axis=-1)                           # h vp vs qp qs
        props = jnp.concatenate(
            [base, jnp.zeros((Cp, nl, 3), jnp.float32), cf],
            axis=-1)                                        # (Cp, nl, 40)
        props = props.reshape(Cp // C_TILE, C_TILE, nl,
                              40).transpose(0, 2, 1, 3)
        args.insert(0, props)
        in_specs.insert(0, pl.BlockSpec(
            (1, nl, C_TILE, 40), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM))
    elif coeff_xla:
        coefs = interface_coeffs_xla(p_a[:, 0], vp_a, vs_a, rho_a)
        args.insert(0, coefs)
        in_specs.insert(0, spec((nl - 1) * 32))

    if dyn:
        # deepest layer whose update can change the response: nonzero
        # thickness, or ANY property contrast across its lower
        # interface (a zero-thickness layer between distinct media
        # still reflects).  The masked padding replicates the
        # halfspace with h=0 (ops/voronoi.py), so padded slots are
        # never "real"; per-tile max governs the kernel's branch.
        hh, vpp, vss, rr, qpp, qss = (h_a, vp_a, vs_a, rho_a,
                                      qp_a, qs_a)
        real = ((hh[:, :-1] > 0.0)
                | (vpp[:, :-1] != vpp[:, 1:])
                | (vss[:, :-1] != vss[:, 1:])
                | (rr[:, :-1] != rr[:, 1:])
                | (qpp[:, :-1] != qpp[:, 1:])
                | (qss[:, :-1] != qss[:, 1:]))
        act = real.reshape(Cp // C_TILE, C_TILE, nl - 1).any(axis=1)
        idx = jnp.arange(nl - 1, dtype=jnp.int32)
        # (1, ntiles) SMEM row — see pallas_secular top-row note
        top = jnp.max(jnp.where(act, idx, 0), axis=-1,
                      keepdims=True).astype(jnp.int32).reshape(1, -1)
        args.insert(0, top)
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))

    outs = pl.pallas_call(
        functools.partial(_resp_kernel, nl, nsamp, float(fsamp),
                          int(wave_type), float(fref), nfreq,
                          dyn, coeff_xla, q_const, scal_xla, False),
        out_shape=[jax.ShapeDtypeStruct((Cp, F), jnp.float32)] * 4,
        grid=(Cp // C_TILE,),
        in_specs=in_specs,
        out_specs=[spec(F)] * 4,
        interpret=interpret,
    )(*args)
    czr, czi, crr, cri = (o[:C, :nfreq] for o in outs)
    return czr + 1j * czi, crr + 1j * cri


def _resp_packed_t(h, vp, vs, rho, p, nl, C, nsamp, fsamp, wave_type,
                   fref, nfreq, F, dyn, q_const, interpret,
                   prep=None):
    """Transposed-layout (NL, C) driver: ONE per-chain operand pack.

    The coefficient table, the per-chain scalars and the three layer
    vectors the kernel reads (h/vp/vs — rho and Q are never read with
    XLA coefficients + uniform Q) are shipped as one
    (C, 3*NL+18) block [h | vp | vs | p | scal] plus the (C, 640)
    coefficient table — two relayout copies replace the row-major
    path's per-operand packs.

    ``prep``: the (coefs, pack) pair in TRANSPOSED layout from the
    operand-prep kernel (ops/pallas_prep.py) — the production path;
    everything including the flattening and the skip depth then
    comes out of one pallas program and this driver only transposes.
    Without it the operands are assembled from the XLA T-layout
    helpers (the measured-slower arm, kept for A/B)."""
    if prep is not None:
        from bayhunter_tpu.ops.pallas_prep import pack_rows_padded
        coefs_t, pack_t = prep
        coefs = coefs_t.T                          # (C, 640)
        pack = pack_t.T                            # (C, rows)
        width = pack_rows_padded(nl)
        depth_col = 3 * nl + 18
    else:
        p = jnp.asarray(p, jnp.float32)
        coefs = interface_coeffs_xla_t(p, vp, vs, rho)    # (C, 640)
        scal_rows = chain_scalars_xla_t(p, h, vp, vs, wave_type)
        width = 3 * nl + 18
        # barrier: the pack concatenate must not become the fusion
        # root of the upstream voronoi/flattening math (see
        # interface_coeffs_xla_t)
        h, vp, vs = jax.lax.optimization_barrier((h, vp, vs))
        pack = jnp.concatenate(
            [h, vp, vs, p[None, :].astype(h.dtype),
             scal_rows.astype(h.dtype)],
            axis=0).astype(jnp.float32).T          # (C, width)
        depth_col = None

    Cp = -(-C // C_TILE) * C_TILE

    def padc(x):
        if Cp == C:
            return x
        return jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (Cp - C,) + x.shape[1:])],
            axis=0)

    args = [padc(coefs), padc(pack)]

    def spec(w):
        return pl.BlockSpec((C_TILE, w), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [spec((nl - 1) * 32), spec(width)]

    if dyn:
        if depth_col is not None:
            # per-chain depth row computed by the prep kernel
            depth = args[1][:, depth_col]                 # (Cp,)
            top = jnp.max(depth.reshape(Cp // C_TILE, C_TILE),
                          axis=1).astype(jnp.int32).reshape(1, -1)
        else:
            # deepest consequential layer (see the row-major driver):
            # with uniform Q the q-contrast terms are identically
            # False
            real = ((h[:-1] > 0.0)
                    | (vp[:-1] != vp[1:])
                    | (vs[:-1] != vs[1:])
                    | (rho[:-1] != rho[1:]))              # (NL-1, C)
            if Cp != C:
                real = jnp.concatenate(
                    [real, jnp.broadcast_to(real[:, :1],
                                            (nl - 1, Cp - C))],
                    axis=1)
            act = real.reshape(nl - 1, Cp // C_TILE,
                               C_TILE).any(axis=2)
            idx = jnp.arange(nl - 1, dtype=jnp.int32)
            top = jnp.max(jnp.where(act, idx[:, None], 0),
                          axis=0).astype(jnp.int32).reshape(1, -1)
        args.insert(0, top)
        in_specs.insert(0, pl.BlockSpec(memory_space=pltpu.SMEM))

    outs = pl.pallas_call(
        functools.partial(_resp_kernel, nl, nsamp, float(fsamp),
                          int(wave_type), float(fref), nfreq,
                          dyn, True, q_const, True, True),
        out_shape=[jax.ShapeDtypeStruct((Cp, F), jnp.float32)] * 4,
        grid=(Cp // C_TILE,),
        in_specs=in_specs,
        out_specs=[spec(F)] * 4,
        interpret=interpret,
    )(*args)
    czr, czi, crr, cri = (o[:C, :nfreq] for o in outs)
    return czr + 1j * czi, crr + 1j * cri
