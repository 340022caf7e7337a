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
