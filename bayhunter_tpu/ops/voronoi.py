"""Masked, fixed-shape Voronoi-nuclei model parametrization (pure JAX).

The transdimensional earth model is a set of ``n`` Voronoi nuclei
``(z_i, vs_i)``; layer interfaces sit at midpoints between consecutive
nuclei depths and the deepest nucleus is the halfspace (reference:
src/Models.py:16-52).  The reference NaN-pads model vectors; here every
model is a fixed-width ``(NL,)`` pair of arrays plus an integer layer
count ``n`` — entries at index ``>= n`` are padding and must never
influence results (mask semantics, XLA-friendly static shapes).

Solver-ready padding convention: the layered model handed to the
forward solvers replicates the halfspace properties into all padded
slots with zero thickness.  A zero-thickness layer contributes an
identity propagator in both the Dunkin/Thomson-Haskell recursion and
the reflectivity recursion, so padded models produce bit-identical
physics to their unpadded counterparts.
"""

from functools import partial

import jax
import jax.numpy as jnp

BIG_Z = 1e9  # sorting sentinel for padded nuclei


def sort_by_depth(vs, z, n):
    """Sort nuclei pairs by depth; padding (i >= n) stays at the end.

    Reference: src/SingleChain.py:315-328 (_sort_modelproposal).
    """
    nl = z.shape[-1]
    idx = jnp.arange(nl)
    zkey = jnp.where(idx < n, z, BIG_Z + idx)
    # variadic lax.sort carries (vs, z) as sort operands instead of
    # argsort + per-row gathers: on TPU the batched 21-wide gather
    # lowers to a GatherScatterIndicesBitpacked custom call costing
    # 4.7 ms at 10240 chains vs 0.05 ms for the operand sort
    # (bit-identical output; stable sort matches argsort tie order).
    _, vs_s, z_s = jax.lax.sort((zkey, vs, z), num_keys=1,
                                is_stable=True)
    return vs_s, z_s


def get_vp(vs, vpvs, n, mantle=None):
    """Vp from Vs with optional separate mantle vp/vs.

    ``mantle=(vs_threshold, mantle_vpvs)``: from the first (shallowest
    index) nucleus with ``vs >= vs_threshold`` downward, the mantle
    ratio applies.  Reference: src/Models.py:27-37.
    """
    nl = vs.shape[-1]
    idx = jnp.arange(nl)
    vp = vs * vpvs
    if mantle is None:
        return vp
    valid = idx < n
    is_m = (vs >= mantle[0]) & valid
    any_m = jnp.any(is_m)
    first_m = jnp.argmax(is_m)  # first True index (0 if none; gated by any_m)
    in_mantle = any_m & (idx >= first_m)
    return jnp.where(in_mantle, vs * mantle[1], vp)


@partial(jax.jit, static_argnames=('mantle',))
def voronoi_to_layers(vs, z, n, vpvs, mantle=None):
    """Convert a (vs, z_vnoi, n) model to solver-ready layer arrays.

    Returns ``(h, vp, vs_l, rho)`` each of shape ``(NL,)`` where:
      * ``h[i]`` is the thickness of layer i for ``i < n-1`` and 0 for
        all padded slots and the halfspace,
      * material properties at slots ``i >= n-1`` replicate the
        halfspace (nucleus ``n-1``),
      * ``rho = 0.32*vp + 0.77`` (reference: src/Targets.py:319).

    Interfaces at nuclei-depth midpoints: reference src/Models.py:40-52.
    """
    nl = vs.shape[-1]
    idx = jnp.arange(nl)
    # interface depths: z_disc[i] = (z[i] + z[i+1]) / 2 for i < n-1
    z_next = jnp.concatenate([z[1:], z[-1:]])
    z_disc = 0.5 * (z + z_next)
    z_disc_prev = jnp.concatenate([jnp.zeros_like(z_disc[:1]), z_disc[:-1]])
    h = z_disc - z_disc_prev
    h = jnp.where(idx < n - 1, h, 0.0)

    vp = get_vp(vs, vpvs, n, mantle)

    # replicate halfspace properties into padded slots.  One-hot
    # reductions instead of jnp.take: under vmap a per-chain dynamic
    # index lowers to a TPU gather custom call with a fixed multi-ms
    # cost at 10k chains, while the masked sum fuses into the
    # surrounding elementwise ops (exactly one index matches).
    hs = jnp.clip(n - 1, 0, nl - 1)
    hs_hot = idx == hs
    vs_hs = jnp.sum(jnp.where(hs_hot, vs, 0.0))
    vp_hs = jnp.sum(jnp.where(hs_hot, vp, 0.0))
    finite = idx < n - 1
    vs_l = jnp.where(finite, vs, vs_hs)
    vp_l = jnp.where(finite, vp, vp_hs)

    rho = vp_l * 0.32 + 0.77
    return h, vp_l, vs_l, rho


def voronoi_to_layers_batch(vs, z, n, vpvs, mantle=None):
    """Batch-first :func:`voronoi_to_layers` on FLAT lanes.

    (C, NL) f32 arrays tile as T(8, 128) with the 21-wide minor dim
    padded to 128 lanes, so the vmapped per-chain conversion pays
    ~6x its flat cost on every elementwise op (the flat-lane rule,
    docs/performance.md).  This variant runs the whole elementwise
    chain on (C*NL,) arrays behind ``optimization_barrier`` (so XLA
    cannot fold the relayout back into padded-layout consumers) and
    reshapes once at each end.  Shifts along the layer axis stay
    within each chain's contiguous NL-segment (masked at segment
    boundaries); the halfspace broadcast is a segment max instead of
    the one-hot sum.  Bitwise-equal output to
    ``jax.vmap(voronoi_to_layers)`` up to f32 reassociation.
    """
    C, nl = vs.shape
    idx = jnp.arange(nl)

    def flat(x):
        return x.reshape(C * nl)

    vs_f, z_f = jax.lax.optimization_barrier((flat(vs), flat(z)))
    n_b = jnp.broadcast_to(n[:, None], (C, nl))
    vpvs_b = jnp.broadcast_to(vpvs[:, None], (C, nl))
    idx_b = jnp.broadcast_to(idx[None, :], (C, nl))
    n_f, vpvs_f, idx_f = jax.lax.optimization_barrier(
        (flat(n_b), flat(vpvs_b), flat(idx_b)))

    last = idx_f == nl - 1
    # z_next: shift-left within each chain segment (the last slot
    # repeats itself, matching the per-chain concatenate)
    z_shift = jnp.concatenate([z_f[1:], z_f[-1:]])
    z_next = jnp.where(last, z_f, z_shift)
    z_disc = 0.5 * (z_f + z_next)
    zd_shift = jnp.concatenate([z_disc[:1], z_disc[:-1]])
    z_disc_prev = jnp.where(idx_f == 0, 0.0, zd_shift)
    h = jnp.where(idx_f < n_f - 1, z_disc - z_disc_prev, 0.0)

    vp = vs_f * vpvs_f
    if mantle is not None:
        valid = idx_f < n_f
        is_m = jnp.where((vs_f >= mantle[0]) & valid, 1.0, 0.0)
        # first mantle index per chain == argmax over the segment;
        # computed as a segment reduction on the (C, NL) view (one
        # reduce op, not a chain)
        is_m2 = is_m.reshape(C, nl)
        any_m = jnp.max(is_m2, axis=1) > 0.5
        first_m = jnp.argmax(is_m2, axis=1)
        in_m = jnp.broadcast_to(any_m[:, None], (C, nl)) \
            & (idx_b >= first_m[:, None])
        in_m_f, = jax.lax.optimization_barrier((flat(in_m),))
        vp = jnp.where(in_m_f, vs_f * mantle[1], vp)

    finite = idx_f < n_f - 1
    # halfspace properties: segment reduction (exactly one slot
    # matches n-1 per chain) on the 2-D view, then flat broadcast
    hs_hot = idx_b == jnp.clip(n[:, None] - 1, 0, nl - 1)
    vs_hs = jnp.max(jnp.where(hs_hot, vs, -jnp.inf), axis=1)
    vs_hs_f, = jax.lax.optimization_barrier(
        (flat(jnp.broadcast_to(vs_hs[:, None], (C, nl))),))
    vp_hs = vs_hs_f * vpvs_f
    if mantle is not None:
        # the halfspace slot's mantle membership rides in_m at n-1;
        # replicate exactly: recompute vp at the halfspace properties
        hs_in_m = jnp.max(jnp.where(hs_hot, in_m, False), axis=1)
        hs_in_m_f, = jax.lax.optimization_barrier(
            (flat(jnp.broadcast_to(hs_in_m[:, None], (C, nl))),))
        vp_hs = jnp.where(hs_in_m_f, vs_hs_f * mantle[1], vp_hs)

    vs_l = jnp.where(finite, vs_f, vs_hs_f)
    vp_l = jnp.where(finite, vp, vp_hs)
    rho = vp_l * 0.32 + 0.77

    h, vp_l, vs_l, rho = jax.lax.optimization_barrier(
        (h, vp_l, vs_l, rho))
    return (h.reshape(C, nl), vp_l.reshape(C, nl),
            vs_l.reshape(C, nl), rho.reshape(C, nl))


# --------------------------------------------------------------------------
# transposed (NL, C) batch variants — chains on the 128-wide LANE axis
#
# A (C, NL) f32 array tiles as T(8, 128) with the 21-wide minor dim
# padded to 128 lanes, so every elementwise op pays ~6x its flat cost
# AND is stored 6x padded in HBM; the flat-lane variants above fix the
# utilization but need optimization_barrier fences that fragment the
# step program into dozens of separate XLA ops (each with a ~µs device
# launch floor — the round-4 step-tail diagnosis).  Storing the model
# axis on SUBLANES and chains on LANES makes every model-vector op
# full-lane NATIVELY: no barriers, no reshapes, and the whole
# propose -> voronoi -> validity chain fuses into a handful of ops.
# Layer-axis shifts become major-dim static shifts, reductions become
# sublane reductions, and the solver operand packs (pallas_walk
# props_t, pallas_rf packed mode) follow from the same layout by pure
# reshape.  Reference semantics identical to the row-major variants
# (src/Models.py:40-52, src/SingleChain.py:330-392).
# --------------------------------------------------------------------------


def sort_by_depth_T(vs_t, z_t, n):
    """:func:`sort_by_depth` on (NL, C) transposed arrays: sorts each
    chain's nuclei along the LEADING axis (``dimension=0``), padding
    (i >= n) keyed to the end.  Same stable variadic lax.sort as the
    row-major path — identical output order per chain."""
    nl = z_t.shape[0]
    idx = jnp.arange(nl)[:, None]
    zkey = jnp.where(idx < n[None, :], z_t,
                     BIG_Z + idx.astype(z_t.dtype))
    _, vs_s, z_s = jax.lax.sort((zkey, vs_t, z_t), dimension=0,
                                num_keys=1, is_stable=True)
    return vs_s, z_s


def voronoi_to_layers_T(vs_t, z_t, n, vpvs, mantle=None):
    """:func:`voronoi_to_layers` on (NL, C) transposed arrays.

    ``vs_t``/``z_t`` are (NL, C); ``n``/``vpvs`` are (C,).  Returns
    (h, vp, vs_l, rho) each (NL, C).  Same formulas as the batch
    variant (value-identical up to f32 fusion reassociation)."""
    nl, C = vs_t.shape
    idx = jnp.arange(nl)[:, None]                        # (NL, 1)
    n_b = n[None, :]

    z_next = jnp.concatenate([z_t[1:], z_t[-1:]], axis=0)
    z_disc = 0.5 * (z_t + z_next)
    z_disc_prev = jnp.concatenate(
        [jnp.zeros_like(z_disc[:1]), z_disc[:-1]], axis=0)
    h = jnp.where(idx < n_b - 1, z_disc - z_disc_prev, 0.0)

    vp = vs_t * vpvs[None, :]
    in_m = None
    if mantle is not None:
        valid = idx < n_b
        is_m = (vs_t >= mantle[0]) & valid
        any_m = jnp.any(is_m, axis=0)                    # (C,)
        first_m = jnp.argmax(is_m, axis=0)               # (C,)
        in_m = any_m[None, :] & (idx >= first_m[None, :])
        vp = jnp.where(in_m, vs_t * mantle[1], vp)

    finite = idx < n_b - 1
    hs_hot = idx == jnp.clip(n - 1, 0, nl - 1)[None, :]
    vs_hs = jnp.sum(jnp.where(hs_hot, vs_t, 0.0), axis=0)  # (C,)
    vp_hs = vs_hs * vpvs
    if mantle is not None:
        hs_in_m = jnp.any(hs_hot & in_m, axis=0)
        vp_hs = jnp.where(hs_in_m, vs_hs * mantle[1], vp_hs)

    vs_l = jnp.where(finite, vs_t, vs_hs[None, :])
    vp_l = jnp.where(finite, vp, vp_hs[None, :])
    rho = vp_l * 0.32 + 0.77
    return h, vp_l, vs_l, rho


def model_is_valid_T(vs_t, z_t, n, vpvs, priors, thickmin, lvz, hvz,
                     mantle=None, h_t=None):
    """:func:`model_is_valid` on (NL, C) transposed arrays; returns
    (C,) bool.  ``h_t`` optionally reuses an already-computed (NL, C)
    thickness array (the voronoi_to_layers_T output)."""
    nl, C = vs_t.shape
    idx = jnp.arange(nl)[:, None]
    n_b = n[None, :]
    if h_t is None:
        h_t, _, _, _ = voronoi_to_layers_T(vs_t, z_t, n, vpvs, mantle)

    valid = idx < n_b
    pair = idx < n_b - 1

    layermin, layermax = priors['layers']
    nlayer = n - 1
    ok = (nlayer >= layermin) & (nlayer <= layermax)

    thick_ok = jnp.where(pair, h_t >= thickmin, True)

    vsmin, vsmax = priors['vs']
    vs_ok = jnp.where(valid, (vs_t >= vsmin) & (vs_t <= vsmax), True)

    zmin, zmax = priors['z']
    zc = jnp.cumsum(h_t, axis=0)
    z_ok = jnp.where(valid, (zc >= zmin) & (zc <= zmax), True)

    vs_next = jnp.concatenate([vs_t[1:], vs_t[-1:]], axis=0)
    vz_ok = jnp.ones_like(valid)
    if lvz is not None:
        vz_ok &= jnp.where(pair, vs_next - vs_t * (1.0 - lvz) > 0,
                           True)
    if hvz is not None:
        vz_ok &= jnp.where(pair, vs_t * (1.0 + hvz) - vs_next > 0,
                           True)

    all_ok = thick_ok & vs_ok & z_ok & vz_ok
    return ok & jnp.all(all_ok, axis=0)


def interface_z(h, n):
    """Cumulative interface depths (masked); padded slots repeat the
    deepest interface.  Used by prior validity checks
    (reference: src/SingleChain.py:365-372)."""
    return jnp.cumsum(h)


def model_is_valid(vs, z, n, vpvs, priors, thickmin, lvz, hvz, mantle=None):
    """Vectorized prior/constraint validity of one model.

    Mirrors reference src/SingleChain.py:330-392: layer-count prior,
    minimum thickness, vs prior, interface-depth prior, optional low-
    and high-velocity-zone limits.  ``priors`` is a dict with 'layers',
    'vs', 'z' entries (host-static tuples).
    """
    nl = vs.shape[-1]
    idx = jnp.arange(nl)
    valid_mask = idx < n

    h, _, _, _ = voronoi_to_layers(vs, z, n, vpvs, mantle)

    layermin, layermax = priors['layers']
    nlayer = n - 1  # reference counts layers excluding halfspace
    ok = (nlayer >= layermin) & (nlayer <= layermax)

    # thickness: all finite layers (i < n-1) must be >= thickmin
    ok &= jnp.all(jnp.where(idx < n - 1, h, jnp.inf) >= thickmin)

    vsmin, vsmax = priors['vs']
    ok &= jnp.all(jnp.where(valid_mask, vs, vsmin) >= vsmin)
    ok &= jnp.all(jnp.where(valid_mask, vs, vsmax) <= vsmax)

    zmin, zmax = priors['z']
    zc = jnp.cumsum(h)
    zc = jnp.where(valid_mask, zc, zmin)
    ok &= jnp.all(zc >= zmin) & jnp.all(zc <= zmax)

    # low-velocity zones: vs[i+1] > vs[i] * (1 - lvz)
    pair_mask = idx < n - 1  # pairs (i, i+1) with i+1 < n
    vs_next = jnp.concatenate([vs[1:], vs[-1:]])
    if lvz is not None:
        comp = vs_next - vs * (1.0 - lvz)
        ok &= jnp.all(jnp.where(pair_mask, comp, 1.0) > 0)
    if hvz is not None:
        comp = vs * (1.0 + hvz) - vs_next
        ok &= jnp.all(jnp.where(pair_mask, comp, 1.0) > 0)

    return ok


def model_is_valid_batch(vs, z, n, vpvs, priors, thickmin, lvz, hvz,
                         mantle=None, layers=None):
    """Batch-first :func:`model_is_valid` (flat-lane elementwise
    chain + one 2-D segment reduction per constraint).  ``layers``
    optionally reuses an already-computed (C, NL) thickness array
    (the voronoi_to_layers output) to avoid recomputing it."""
    C, nl = vs.shape
    idx = jnp.arange(nl)
    if layers is None:
        h, _, _, _ = voronoi_to_layers_batch(vs, z, n, vpvs, mantle)
    else:
        h = layers

    def flat(x):
        return x.reshape(C * nl)

    idx_b = jnp.broadcast_to(idx[None, :], (C, nl))
    n_b = jnp.broadcast_to(n[:, None], (C, nl))
    vs_f, h_f, idx_f, n_f = jax.lax.optimization_barrier(
        (flat(vs), flat(h), flat(idx_b), flat(n_b.astype(jnp.int32))))

    valid_f = idx_f < n_f
    pair_f = idx_f < n_f - 1

    layermin, layermax = priors['layers']
    nlayer = n - 1
    ok = (nlayer >= layermin) & (nlayer <= layermax)

    thick_ok = jnp.where(pair_f, h_f >= thickmin, True)

    vsmin, vsmax = priors['vs']
    vs_ok = jnp.where(valid_f, (vs_f >= vsmin) & (vs_f <= vsmax),
                      True)

    zmin, zmax = priors['z']
    # cumsum needs the segment structure: one 2-D cumsum op
    zc = jnp.cumsum(h, axis=1)
    zc_f, = jax.lax.optimization_barrier((flat(zc),))
    z_ok = jnp.where(valid_f, (zc_f >= zmin) & (zc_f <= zmax), True)

    # velocity-zone limits on consecutive active pairs
    last = idx_f == nl - 1
    vs_next = jnp.where(last, vs_f,
                        jnp.concatenate([vs_f[1:], vs_f[-1:]]))
    vz_ok = jnp.ones_like(valid_f)
    if lvz is not None:
        vz_ok &= jnp.where(pair_f, vs_next - vs_f * (1.0 - lvz) > 0,
                           True)
    if hvz is not None:
        vz_ok &= jnp.where(pair_f, vs_f * (1.0 + hvz) - vs_next > 0,
                           True)

    all_ok = thick_ok & vs_ok & z_ok & vz_ok
    all_ok, = jax.lax.optimization_barrier((all_ok,))
    return ok & jnp.all(all_ok.reshape(C, nl), axis=1)


def to_reference_vector(vs, z, n, nl=None):
    """Pack (vs, z, n) into the reference's NaN-padded flat vector
    ``[vs_0..vs_{n-1}, nan.., z_0..z_{n-1}, nan..]`` of length 2*NL
    (reference: src/mcmcOptimizer.py:92-94, src/Models.py:16-24)."""
    if nl is None:
        nl = vs.shape[-1]
    idx = jnp.arange(nl)
    mask = idx < n
    vs_p = jnp.where(mask, vs, jnp.nan)
    z_p = jnp.where(mask, z, jnp.nan)
    return jnp.concatenate([vs_p, z_p], axis=-1)
