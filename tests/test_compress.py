"""Unique-value compression vs a per-gene dictionary oracle."""

import numpy as np
import scipy.sparse as sparse

from memento_tpu.ops.compress import compress_group, compress_pairs
from memento_tpu.ops.size_factor import bin_size_factor, factorize_approx_sf

import oracle


def test_compress_group_exact(rng):
    n, g = 300, 12
    X = rng.poisson(0.8, size=(n, g)).astype(np.float64)
    sf = rng.random(n) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=8)

    comp = compress_group(sparse.csr_matrix(X), approx_sf, backend="numpy")
    assert comp.n_obs == n
    assert comp.counts.sum() == n * g  # every cell accounted for, per gene

    for j in range(g):
        vals0, sfs0, cnts0 = oracle.unique_compress(X[:, j], approx_sf)
        order0 = np.lexsort((sfs0, vals0))
        u = comp.n_unique[j]
        vals1 = comp.values[j, :u]
        sfs1 = 1.0 / comp.inv_sf[j, :u]
        cnts1 = comp.counts[j, :u]
        order1 = np.lexsort((sfs1, vals1))
        np.testing.assert_allclose(vals1[order1], vals0[order0])
        np.testing.assert_allclose(sfs1[order1], sfs0[order0], rtol=1e-6)
        np.testing.assert_allclose(cnts1[order1], cnts0[order0])
        # padding is inert
        assert np.all(comp.counts[j, u:] == 0)


def test_compress_pairs_exact(rng):
    n, g = 200, 6
    X = rng.poisson(0.7, size=(n, g)).astype(np.float64)
    sf = rng.random(n) + 0.5
    approx_sf = bin_size_factor(sf, num_bins=5)
    idx1 = np.array([0, 2, 4])
    idx2 = np.array([1, 3, 5])
    comp = compress_pairs(sparse.csc_matrix(X), approx_sf, idx1, idx2)

    for p in range(len(idx1)):
        pairs = {}
        for i in range(n):
            k = (X[i, idx1[p]], X[i, idx2[p]], approx_sf[i])
            pairs[k] = pairs.get(k, 0) + 1
        u = comp.n_unique[p]
        want = np.array(
            sorted((a, b, c, v) for (a, b, c), v in pairs.items())
        )
        got = np.stack(
            [
                comp.values_1[p, :u],
                comp.values_2[p, :u],
                1.0 / comp.inv_sf[p, :u],
                comp.counts[p, :u],
            ],
            axis=1,
        )
        got = got[np.lexsort((got[:, 2], got[:, 1], got[:, 0]))]
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_factorize_roundtrip(rng):
    sf = rng.random(100) + 0.5
    approx = bin_size_factor(sf, num_bins=30)
    vals, ids = factorize_approx_sf(approx)
    np.testing.assert_allclose(vals[ids], approx)
    assert len(vals) <= 31


def test_bin_size_factor_max_kept(rng):
    sf = rng.random(1000) * 3 + 0.1
    approx = bin_size_factor(sf, num_bins=30)
    assert approx[np.argmax(sf)] == sf.max()
    # bin means preserve overall mass approximately
    assert abs(approx.mean() - sf.mean()) < 0.05


def test_sf_bin_compact_transport_reconstructs(rng):
    """bin_inv_sf[sf_bin] must reconstruct inv_sf exactly (both backends)."""
    from memento_tpu.ops.compress import compress_group
    from memento_tpu.ops.size_factor import bin_size_factor
    import scipy.sparse as sparse

    X = sparse.random(300, 40, density=0.2, random_state=0, data_rvs=lambda n: rng.integers(1, 8, n))
    sf = rng.random(300) + 0.5
    asf = bin_size_factor(sf, 30)
    for backend in ("numpy", "auto"):
        comp = compress_group(X.tocsc(), asf, backend=backend)
        assert comp.sf_bin is not None and comp.sf_bin.dtype == np.uint8
        np.testing.assert_array_equal(
            comp.bin_inv_sf[comp.sf_bin], comp.inv_sf
        )
        # padding slots carry id 0 (inv 1.0)
        for g in range(comp.num_genes):
            assert (comp.sf_bin[g, comp.n_unique[g]:] == 0).all()


def test_sf_binned_tile_matches_float_transport(rng):
    """ht_1d_tile(sf_binned=True) == the float-transport path bit-for-bit."""
    import jax
    import jax.numpy as jnp
    from memento_tpu.inference.ht import ht_1d_tile
    from memento_tpu.ops.estimators import HYPER_RELATIVE

    r, t, u, nb = 2, 8, 12, 5
    table = (rng.random((r, nb)) + 0.5).astype(np.float32)
    table[:, 0] = 1.0
    ids = rng.integers(0, nb, size=(r, t, u)).astype(np.uint8)
    inv_sf = np.take_along_axis(table[:, None, :].repeat(t, 1), ids.astype(int), axis=2)
    values = rng.integers(0, 6, size=(r, t, u)).astype(np.float32)
    counts = rng.integers(1, 30, size=(r, t, u)).astype(np.float32)
    n_unique = np.full((r, t), u, np.int32)
    true_mean = rng.random((r, t)).astype(np.float32) + 0.5
    true_rv = rng.random((r, t)).astype(np.float32) + 0.5
    mv = np.tile(np.array([0.0, 1.0, 0.0], np.float32), (r, 1))
    q = np.full(r, 0.1, np.float32)
    n_obs = counts.sum(2).mean(1).astype(np.float32)
    cov = np.ones((r, 1), np.float32)
    tx = rng.integers(0, 2, size=(t, r, 1)).astype(np.float32)
    static = dict(num_boot=32, model=HYPER_RELATIVE, sampler="multinomial",
                  one_sample=False, resampling="bootstrap", approx=True,
                  resample_rep=False, boot_chunk=32)
    key = jax.random.key(3)
    common = (jnp.asarray(n_unique), jnp.asarray(true_mean),
              jnp.asarray(true_rv), jnp.asarray(mv), jnp.asarray(q),
              jnp.asarray(n_obs), jnp.asarray(cov), jnp.asarray(tx))
    ref = ht_1d_tile(key, jnp.asarray(values), jnp.asarray(counts),
                     jnp.asarray(inv_sf), jnp.asarray(inv_sf * inv_sf),
                     *common, **static)
    got = ht_1d_tile(key, jnp.asarray(values), jnp.asarray(counts),
                     jnp.asarray(ids), jnp.asarray(table),
                     *common, sf_binned=True, **static)
    for k in ["mean_coef", "mean_pval", "var_coef", "var_pval"]:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=1e-6, equal_nan=True)
