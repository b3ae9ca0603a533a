"""Likelihood kernels vs dense reference formulations."""

import numpy as np
import jax.numpy as jnp

from bayhunter_tpu.ops import likelihood as lk


def dense_logl(ydiff, c_inv, logc_det):
    n = ydiff.size
    madist = ydiff @ c_inv @ ydiff
    return -0.5 * (n * np.log(2 * np.pi) + logc_det) - madist / 2


def test_nocorr_matches_dense():
    rng = np.random.RandomState(0)
    d = rng.randn(37)
    sigma = 0.02
    c_inv = np.eye(37) / sigma ** 2
    logdet = 2 * 37 * np.log(sigma)
    expect = dense_logl(d, c_inv, logdet)
    got = float(lk.loglike_nocorr(jnp.asarray(d), sigma))
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_exp_matches_dense_tridiagonal():
    """Matrix-free exponential-correlation logL equals the reference's
    explicit tridiagonal inverse (src/Targets.py:132-148)."""
    rng = np.random.RandomState(1)
    n = 41
    d = rng.randn(n) * 0.01
    sigma, corr = 0.012, 0.55

    diag = np.ones(n) + corr ** 2
    diag[0] = diag[-1] = 1
    off = np.ones(n - 1) * -corr
    c_inv = (np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)) \
        / (sigma ** 2 * (1 - corr ** 2))
    logdet = 2 * n * np.log(sigma) + (n - 1) * np.log(1 - corr ** 2)
    expect = dense_logl(d, c_inv, logdet)
    got = float(lk.loglike_exp(jnp.asarray(d), sigma, corr))
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_exp_inverse_is_true_inverse():
    """The analytic tridiagonal form actually inverts the exponential
    correlation matrix."""
    n, corr = 25, 0.7
    R = lk.exp_correlation_matrix(corr, n)
    diag = np.ones(n) + corr ** 2
    diag[0] = diag[-1] = 1
    off = np.ones(n - 1) * -corr
    R_inv = (np.diag(diag) + np.diag(off, 1) + np.diag(off, -1)) \
        / (1 - corr ** 2)
    np.testing.assert_allclose(R @ R_inv, np.eye(n), atol=1e-10)


def test_gauss_matches_dense():
    rng = np.random.RandomState(2)
    n = 51
    d = rng.randn(n) * 0.005
    sigma, corr = 0.005, 0.9
    corr_inv, logcorr_det = lk.init_covariance_gauss(corr, n)
    c_inv = corr_inv / sigma ** 2
    logdet = 2 * n * np.log(sigma) + logcorr_det
    expect = dense_logl(d, c_inv, logdet)
    got = float(lk.loglike_gauss(jnp.asarray(d), sigma,
                                 jnp.asarray(corr_inv), logcorr_det))
    np.testing.assert_allclose(got, expect, rtol=1e-10)


def test_scalederr_matches_dense():
    rng = np.random.RandomState(3)
    n = 19
    d = rng.randn(n)
    yerr = rng.rand(n) + 0.5
    sigma = 0.1
    scaled = yerr / yerr.min()
    c_inv = np.diag(1.0 / (scaled * sigma ** 2))
    logdet = 2 * n * np.log(sigma) + np.log(np.prod(scaled))
    expect = dense_logl(d, c_inv, logdet)
    got = float(lk.loglike_nocorr_scalederr(
        jnp.asarray(d), sigma, jnp.asarray(scaled),
        float(np.sum(np.log(scaled)))))
    np.testing.assert_allclose(got, expect, rtol=1e-12)


def test_batched_shapes():
    d = jnp.asarray(np.random.RandomState(4).randn(16, 21))
    sig = jnp.full((16,), 0.01)
    out = lk.loglike_exp(d, sig, jnp.full((16,), 0.3))
    assert out.shape == (16,)


def test_gauss_whitener_matches_pinv_and_stays_psd():
    """The whitened Gaussian law must (a) agree with the dense pinv
    form in float64 and (b) keep the Mahalanobis term non-negative in
    float32 even for near-fitting residuals under extreme conditioning
    (r=0.98, n=201) — the dense contraction can round negative, which
    lets the sampler blow logL up by shrinking sigma (regression for a
    bug caught in the tutorial-scale TPU run)."""
    import numpy as np
    import jax.numpy as jnp
    from bayhunter_tpu.ops import likelihood as lk

    n, corr, rcond = 201, 0.98, 1e-5
    rs = np.random.RandomState(0)

    w, logdet_w = lk.gauss_whitener(corr, n, rcond=rcond)
    corr_inv, logdet_i = lk.init_covariance_gauss(corr, n, rcond=rcond)
    assert abs(logdet_w - logdet_i) < 1e-6

    # (a) agreement with the dense pinv form in f64
    d = 0.05 * rs.normal(size=n)
    q_w = float(np.sum((d @ w) ** 2))
    q_i = float(d @ corr_inv @ d)
    np.testing.assert_allclose(q_w, q_i, rtol=1e-8)

    # (b) f32 positivity on many small (near-fit) residuals
    w32 = jnp.asarray(w, jnp.float32)
    for trial in range(50):
        d32 = jnp.asarray(1e-3 * rs.normal(size=n), jnp.float32)
        q32 = float(jnp.sum((d32 @ w32) ** 2))
        assert q32 >= 0.0
        logL = float(lk.loglike_gauss_white(d32, jnp.float32(1e-5),
                                            w32, logdet_w))
        # bounded above by the sigma->0 limit of a zero residual
        assert logL < -0.5 * (n * lk.LOG2PI
                              + 2 * n * np.log(1e-5) + logdet_w) + 1.0


def test_gauss_dof_correction_unbiases_sigma():
    """The rcond truncation keeps k of n eigenvalues, so the
    reference-parity law's sigma MLE estimates sqrt(k/n)*sigma_true
    (VALIDATION.md sigma_RF note).  The DOF-corrected law
    (loglike_gauss_white_dof) must recover the injected sigma — and
    the biased law must recover sqrt(k/n)*sigma, confirming the
    correction factor is exactly the subspace fraction."""
    n, corr, rcond = 126, 0.98, 1e-5
    sigma_true = 0.005
    rs = np.random.RandomState(1)

    R = lk.gauss_correlation_matrix(corr, n)
    L = np.linalg.cholesky(R + 1e-12 * np.eye(n))
    draws = 64
    noise = (sigma_true * (L @ rs.normal(size=(n, draws)))).T

    w_full, logdet_full = lk.gauss_whitener(corr, n, rcond=rcond)
    w_kept, logdet_kept = lk.gauss_whitener(corr, n, rcond=rcond,
                                            return_kept=True)
    np.testing.assert_allclose(w_full, w_kept)
    k = w_kept.shape[1]
    assert k < n  # truncation is real at this conditioning

    sig_grid = np.linspace(0.4 * sigma_true, 1.6 * sigma_true, 481)

    def mle(loglike, *args):
        ll = np.array([
            np.mean(np.asarray(loglike(jnp.asarray(noise), s, *args)))
            for s in sig_grid])
        return sig_grid[np.argmax(ll)]

    sig_dof = mle(lk.loglike_gauss_white_dof,
                  jnp.asarray(w_kept), logdet_kept)
    sig_ref = mle(lk.loglike_gauss_white,
                  jnp.asarray(w_full), logdet_full)

    assert abs(sig_dof - sigma_true) < 0.05 * sigma_true, sig_dof
    expect_biased = np.sqrt(k / n) * sigma_true
    assert abs(sig_ref - expect_biased) < 0.05 * sigma_true, \
        (sig_ref, expect_biased)
