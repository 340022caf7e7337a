"""h5ad round-trip tests."""

import numpy as np
import pandas as pd
import pytest
import scipy.sparse as sparse

h5py = pytest.importorskip("h5py")

from memento_tpu.containers import AnnData
from memento_tpu.io.h5ad import read_h5ad, write_h5ad


def test_roundtrip_sparse(tmp_path, rng):
    X = sparse.random(50, 20, density=0.3, format="csr",
                      random_state=np.random.RandomState(0))
    obs = pd.DataFrame(
        {
            "cond": pd.Categorical(["a", "b"] * 25),
            "q": rng.random(50),
            "name": [f"c{i}" for i in range(50)],
        },
        index=[f"cell{i}" for i in range(50)],
    )
    var = pd.DataFrame(index=[f"g{i}" for i in range(20)])
    adata = AnnData(X, obs=obs, var=var,
                    uns={"memento": {"all_q": 0.1, "groups": ["sg^a", "sg^b"],
                                     "arr": np.arange(3.0)}})
    path = tmp_path / "t.h5ad"
    write_h5ad(path, adata)
    back = read_h5ad(path)
    np.testing.assert_allclose(back.X.toarray(), X.toarray(), rtol=1e-6)
    assert list(back.obs.columns) == ["cond", "q", "name"]
    assert list(back.obs["cond"]) == list(obs["cond"].astype(str))
    np.testing.assert_allclose(back.obs["q"].values, obs["q"].values)
    assert back.var.index.tolist() == var.index.tolist()
    assert back.uns["memento"]["all_q"] == 0.1
    assert back.uns["memento"]["groups"] == ["sg^a", "sg^b"]
    np.testing.assert_allclose(back.uns["memento"]["arr"], np.arange(3.0))


def test_roundtrip_dense(tmp_path, rng):
    X = rng.poisson(1.0, size=(10, 5)).astype(np.float32)
    adata = AnnData(sparse.csr_matrix(X))
    # dense write path
    adata.X = X
    path = tmp_path / "d.h5ad"
    write_h5ad(path, adata)
    back = read_h5ad(path)
    np.testing.assert_allclose(np.asarray(back.X), X)


def _write_anndata_spec_file(path, X, obs_cond, obs_q, gene_names):
    """Write an .h5ad exactly as anndata >= 0.8 would (vlen utf-8 strings,
    encoding-type/-version attrs on every node) WITHOUT using our writer —
    the fixture a real anndata user would hand the pipeline."""
    str_dt = h5py.string_dtype(encoding="utf-8")
    n, g = X.shape
    with h5py.File(path, "w") as f:
        f.attrs["encoding-type"] = "anndata"
        f.attrs["encoding-version"] = "0.1.0"
        xg = f.create_group("X")
        xg.attrs["encoding-type"] = "csr_matrix"
        xg.attrs["encoding-version"] = "0.1.0"
        xg.attrs["shape"] = np.array([n, g], dtype=np.int64)
        xg.create_dataset("data", data=X.data.astype(np.float32))
        xg.create_dataset("indices", data=X.indices.astype(np.int32))
        xg.create_dataset("indptr", data=X.indptr.astype(np.int32))

        og = f.create_group("obs")
        og.attrs["encoding-type"] = "dataframe"
        og.attrs["encoding-version"] = "0.2.0"
        og.attrs["_index"] = "_index"
        og.attrs["column-order"] = np.array(["condition", "capture_q"],
                                            dtype=str_dt)
        idx = og.create_dataset(
            "_index", data=np.array([f"AAACATACAACCAC-{i}" for i in range(n)],
                                    dtype=str_dt))
        idx.attrs["encoding-type"] = "string-array"
        cg = og.create_group("condition")  # categorical, as anndata writes
        cg.attrs["encoding-type"] = "categorical"
        cg.attrs["encoding-version"] = "0.2.0"
        cg.attrs["ordered"] = False
        cats = sorted(set(obs_cond))
        cg.create_dataset("categories", data=np.array(cats, dtype=str_dt))
        cg.create_dataset(
            "codes",
            data=np.array([cats.index(c) for c in obs_cond], dtype=np.int8))
        qd = og.create_dataset("capture_q", data=obs_q.astype(np.float64))
        qd.attrs["encoding-type"] = "array"

        vg = f.create_group("var")
        vg.attrs["encoding-type"] = "dataframe"
        vg.attrs["encoding-version"] = "0.2.0"
        vg.attrs["_index"] = "_index"
        vg.attrs["column-order"] = np.array([], dtype=str_dt)
        vidx = vg.create_dataset(
            "_index", data=np.array(list(gene_names), dtype=str_dt))
        vidx.attrs["encoding-type"] = "string-array"

        ug = f.create_group("uns")
        ug.attrs["encoding-type"] = "dict"
        ug.attrs["encoding-version"] = "0.1.0"


def test_anndata_spec_file_through_full_pipeline(tmp_path, rng):
    """Read an anndata-spec file written by INDEPENDENT h5py code (the shape
    a real anndata user produces), run tutorial flow 1 end to end, persist
    the fitted analysis, and recover the HT results from disk."""
    import memento_tpu as mt

    n_per, g = 600, 25
    lam = np.exp(rng.uniform(np.log(0.1), np.log(3.0), g))
    X0 = rng.poisson(lam, size=(n_per, g))
    X1 = rng.poisson(lam * np.where(np.arange(g) < 4, 1.8, 1.0),
                     size=(n_per, g))
    X = sparse.csr_matrix(np.vstack([X0, X1]).astype(np.float32))
    cond = ["ctrl"] * n_per + ["stim"] * n_per
    qs = np.full(2 * n_per, 0.1)
    genes = [f"GENE{i}" for i in range(g)]
    src = tmp_path / "interferon_like.h5ad"
    _write_anndata_spec_file(src, X, cond, qs, genes)

    adata = read_h5ad(src)
    assert adata.shape == (2 * n_per, g)
    assert adata.obs["condition"].astype(str).tolist() == cond
    assert adata.var.index.tolist() == genes

    # tutorial flow 1 (docs/source/tutorials/binary_testing.ipynb shape)
    mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                     trim_percent=0.3)
    mt.create_groups(adata, label_columns=["condition"])
    mt.compute_1d_moments(adata, min_perc_group=0.5)
    gdf = mt.get_groups(adata)
    cov = pd.DataFrame(np.ones((len(gdf), 1)), index=gdf.index)
    tx = pd.DataFrame(
        {"tx": (gdf["condition"] == "stim").astype(float).values},
        index=gdf.index)
    mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=200,
                     resampling="bootstrap", tile_size=32)
    res = mt.get_1d_ht_result(adata)
    de = res[res.gene.isin(genes[:4])]
    assert np.nanmedian(de.de_pval) < 0.05

    # persist the FITTED analysis: results must round-trip
    mt.prepare_to_save(adata)
    out = tmp_path / "fitted.h5ad"
    write_h5ad(out, adata)  # everything post-prepare_to_save serializes
    back = read_h5ad(out)
    ht = back.uns["memento"]["1d_ht"]
    np.testing.assert_allclose(ht["mean_coef"], res.de_coef.values,
                               equal_nan=True)
    np.testing.assert_allclose(ht["mean_asl"], res.de_pval.values,
                               equal_nan=True)
    assert isinstance(ht["treatment"], pd.DataFrame)
    np.testing.assert_allclose(ht["treatment"]["tx"].values, tx["tx"].values)
    # group slices round-trip as sparse matrices
    gc = back.uns["memento"]["group_cells"]
    for k, v in adata.uns["memento"]["group_cells"].items():
        np.testing.assert_allclose(gc[k].toarray(), v.toarray())


def test_write_warns_on_unserializable(tmp_path):
    adata = AnnData(sparse.csr_matrix(np.eye(3)),
                    uns={"bad": object(), "ok": 1.0})
    with pytest.warns(UserWarning, match="dropped"):
        write_h5ad(tmp_path / "w.h5ad", adata)
    back = read_h5ad(tmp_path / "w.h5ad")
    assert back.uns["ok"] == 1.0
    assert "bad" not in back.uns


def test_tutorial_scripts_end_to_end(tmp_path):
    """The shipped tutorial scripts (examples/) run all four reference
    tutorial flows from a generated .h5ad file — C25 'runnable tutorials'."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    demo = tmp_path / "demo.h5ad"
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(repo)
    r1 = subprocess.run(
        [sys.executable, str(repo / "examples" / "make_demo_h5ad.py"),
         str(demo), "--cells-per-group", "200"],
        capture_output=True, text=True, timeout=120, env=env, cwd=repo)
    assert r1.returncode == 0, r1.stderr[-2000:]
    assert demo.exists()
    r2 = subprocess.run(
        [sys.executable, str(repo / "examples" / "run_tutorials.py"),
         str(demo), "--num-boot", "200"],
        capture_output=True, text=True, timeout=560, env=env, cwd=repo)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "TUTORIALS OK" in r2.stdout
