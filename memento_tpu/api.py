"""Public API (L3 orchestration) — the memento 13-function surface.

Mirrors the reference's public interface (``/root/reference/memento/
main.py``, re-exported at ``memento/__init__.py:1``) over the AnnData
container, with the same ``adata.uns['memento']`` side-car state layout, so
analyses written against the reference run with an import swap.  The
execution model underneath is completely different: instead of per-gene
joblib process fan-out (ref ``main.py:397,501``), tests run as gene-tiled,
bootstrap-vectorized device programs (``memento_tpu.inference.ht``).

Documented divergences from reference *bugs* (SURVEY.md §7 "reference bugs
to not reproduce"):

- per-group mv-regressors: the reference fits every group's regressor on the
  same concatenated arrays (``main.py:242-245`` ignores the per-group
  ``m, v``), i.e. all groups share one fit; we implement that evident
  behavior explicitly.
- ``ht_2d_moments`` ``treatment_for_gene`` key: the reference builds
  ``frozenset({var.index[idx_1], var.index[idx_1]})`` (``main.py:492``,
  ``idx_1`` twice); we use the evident intent ``{gene_1, gene_2}``.
- ``prepare_to_save``: the reference references an unimported ``pkl``
  (``main.py:673-682``); we import pickle properly.
- RNG: the reference reuses a fixed ``PCG64(5)`` for every bootstrap and the
  global numpy RNG for fills; we use counter-based JAX keys per (gene,
  group) — bit parity is impossible, distributional parity is the contract.
"""

from __future__ import annotations

import itertools
import pickle

import numpy as np
import pandas as pd
import scipy.sparse as sparse

import jax

from .containers import AnnData
from .inference.ht import run_ht_1d, run_ht_2d
from .ops import estimators as est
from .ops.corr import corr_matrix_device, cov_sparse_pairs
from .ops.mv_regression import fit_mv_regressor
from .ops.size_factor import bin_size_factor, estimate_size_factor

__all__ = [
    "setup_memento",
    "create_groups",
    "compute_1d_moments",
    "compute_2d_moments",
    "ht_1d_moments",
    "ht_2d_moments",
    "get_1d_moments",
    "get_2d_moments",
    "get_1d_ht_result",
    "get_2d_ht_result",
    "prepare_to_save",
    "get_corr_matrix",
    "get_groups",
]


def _obs_mean(X):
    """Per-gene observed mean; one fused native CSR pass when available
    (avoids scipy's extra matvec pass on the full atlas-scale matrix)."""
    if sparse.issparse(X) and X.format == "csr":
        from .native import col_sums_csr_native

        res = col_sums_csr_native(X)
        if res is not None:
            return res[0] / X.shape[0]
    return np.asarray(X.mean(axis=0)).ravel()


def _residual_variance_np(mean, var, coeffs):
    """Host-side residual variance (ref ``estimator.py:103-111``)."""
    mean = np.asarray(mean, dtype=np.float64)
    var = np.asarray(var, dtype=np.float64)
    rv = np.full(mean.shape, np.nan)
    cond = (mean > 0) & (var > 0)
    c2, c1, c0 = coeffs
    lm = np.log(mean[cond])
    rv[cond] = np.exp(np.log(var[cond]) - (c2 * lm * lm + c1 * lm + c0))
    return rv


def _observed_moments(uns, X, n_obs, q, size_factor, mesh=None):
    """Dispatch observed 1D moments: registry model or custom callable.

    With ``mesh`` given, moments stream through the cell-sharded
    data-parallel accumulator (``parallel.streaming``) instead of host
    scipy — exact same sums, device-resident."""
    et = uns["estimator_type"]
    model = est.get_noise_model(et)
    if model is None:  # custom (fn_1d, fn_cov) tuple, reference-style call
        return et[0](data=X.tocsc(), n_obs=n_obs, q=q, size_factor=size_factor)
    if mesh is not None:
        from .parallel.streaming import stream_mean_var

        m, v = stream_mean_var(mesh, X, size_factor, q, model)
        return [m, v]
    if not model.relative:
        size_factor = np.ones(n_obs)
    m, v = est.mean_var_sparse(X, size_factor, q, model)
    return [np.asarray(m), np.asarray(v)]


# ---------------------------------------------------------------------------
# setup / grouping  (ref main.py:26-168)
# ---------------------------------------------------------------------------


def setup_memento(
    adata,
    q_column,
    inplace=True,
    filter_mean_thresh=0.07,
    trim_percent=0.1,
    shrinkage=0.5,
    num_bins=30,
    estimator_type="hyper_relative",
    mesh=None,
):
    """Compute size factors and the overall mean-variance regressor
    (ref ``main.py:26-91``).

    With ``mesh`` given (a ``jax.sharding.Mesh`` with a ``data`` axis), the
    whole-dataset moment passes stream cell blocks through the sharded
    data-parallel accumulator instead of host scipy."""
    if not inplace:
        adata = adata.copy()

    assert adata.obs[q_column].max() < 1
    if not sparse.issparse(adata.X):
        adata.X = sparse.csr_matrix(adata.X)
    adata.X = adata.X.tocsr()

    uns = adata.uns["memento"] = {}
    uns["q_column"] = q_column
    uns["all_q"] = float(adata.obs[q_column].values.mean())
    uns["estimator_type"] = estimator_type
    uns["filter_mean_thresh"] = filter_mean_thresh
    uns["num_bins"] = num_bins

    # naive total-count size factor (ref main.py:55-59)
    naive_sf = estimate_size_factor(adata.X, estimator_type, total=True,
                                    shrinkage=0.0)

    # residual variance over all cells with the naive factor (ref 62-68)
    if mesh is not None:
        from .parallel.streaming import stream_mean_var

        all_m, all_v = stream_mean_var(mesh, adata.X, naive_sf,
                                       uns["all_q"], est.HYPER_RELATIVE)
    else:
        all_m, all_v = est.mean_var_sparse(adata.X, naive_sf, uns["all_q"],
                                           "hyper_relative")
    obs_mean = _obs_mean(adata.X)
    all_m = np.asarray(all_m).copy()
    all_m[obs_mean < filter_mean_thresh] = 0  # mean filter
    all_res_var = _residual_variance_np(all_m, all_v,
                                        fit_mv_regressor(all_m, all_v))

    # least-variable genes for normalization (ref 70-75).  Robustness guard
    # beyond the reference: with no finite residual variances (degenerate
    # tiny inputs) fall back to all expressed genes instead of crashing on
    # an empty quantile.
    finite_rv = all_res_var[np.isfinite(all_res_var)]
    if finite_rv.size:
        rv_ulim = np.quantile(finite_rv, trim_percent)
        all_res_var = np.where(np.isfinite(all_res_var), all_res_var, np.inf)
        mask = all_res_var < rv_ulim
    else:
        mask = obs_mean > 0
    if not mask.any():
        mask = obs_mean > 0
    uns["least_variable_genes"] = adata.var.index[mask].tolist()

    # masked + shrunk size factor (ref 77-83); guard zero-total cells
    # (1/sf would be inf — the reference propagates the inf)
    size_factor = estimate_size_factor(adata.X, estimator_type, mask=mask,
                                       shrinkage=shrinkage)
    if np.any(size_factor <= 0):
        floor = size_factor[size_factor > 0].min() if (size_factor > 0).any() else 1.0
        size_factor = np.where(size_factor > 0, size_factor, floor)
    adata.obs["memento_size_factor"] = size_factor

    # final overall moments with the configured estimator (ref 85-91)
    uns["all_1d_moments"] = list(
        _observed_moments(uns, adata.X, adata.shape[0], uns["all_q"],
                          size_factor, mesh=mesh)
    )
    if not inplace:
        return adata


def create_groups(adata, label_columns, label_delimiter="^", inplace=True):
    """Create discrete cell groups from obs columns (ref ``main.py:94-135``)."""
    if not inplace:
        adata = adata.copy()

    labels = pd.Series("sg" + label_delimiter, index=adata.obs.index)
    for idx, col in enumerate(label_columns):
        labels = labels + adata.obs[col].astype(str)
        if idx != len(label_columns) - 1:
            labels = labels + label_delimiter
    adata.obs["memento_group"] = labels

    uns = adata.uns["memento"]
    uns["label_columns"] = list(label_columns)
    uns["label_delimiter"] = label_delimiter
    uns["groups"] = adata.obs["memento_group"].drop_duplicates().tolist()
    uns["q"] = adata.obs[uns["q_column"]].values

    X_csc = adata.X.tocsc()
    group_masks = {
        g: (adata.obs["memento_group"] == g).values for g in uns["groups"]
    }
    uns["group_cells"] = {g: X_csc[m, :] for g, m in group_masks.items()}
    uns["group_q"] = {
        g: float(uns["q"][m].mean()) for g, m in group_masks.items()
    }
    if not inplace:
        return adata


def _bin_size_factor_uns(adata):
    """Quantize size factors per group (ref ``main.py:138-153``)."""
    uns = adata.uns["memento"]
    size_factor = adata.obs["memento_size_factor"].values
    approx_sf = bin_size_factor(size_factor, num_bins=uns["num_bins"])
    uns["all_approx_size_factor"] = approx_sf
    uns["approx_size_factor"] = {
        g: approx_sf[(adata.obs["memento_group"] == g).values]
        for g in uns["groups"]
    }
    uns["size_factor"] = {
        g: size_factor[(adata.obs["memento_group"] == g).values]
        for g in uns["groups"]
    }


def get_groups(adata):
    """Parse group labels back into a DataFrame (ref ``main.py:156-168``)."""
    uns = adata.uns["memento"]
    rows = [g.split(uns["label_delimiter"])[1:] for g in uns["groups"]]
    df = pd.DataFrame(rows, index=uns["groups"], columns=uns["label_columns"])
    for col in df.columns:
        try:
            df[col] = pd.to_numeric(df[col])
        except (ValueError, TypeError):
            pass
    return df


# ---------------------------------------------------------------------------
# 1D moments  (ref main.py:171-274)
# ---------------------------------------------------------------------------


def compute_1d_moments(adata, inplace=True, min_perc_group=0.7,
                       filter_genes=True, gene_list=None, mesh=None):
    """Mean / variance / residual variance per group (ref ``main.py:171-274``).

    With ``mesh`` given, per-group observed moments stream through the
    cell-sharded data-parallel accumulator."""
    assert "memento" in adata.uns
    if not inplace:
        adata = adata.copy()
    uns = adata.uns["memento"]

    if "size_factor" not in uns:
        _bin_size_factor_uns(adata)

    groups = uns["groups"]
    uns["1d_moments"] = {
        g: _observed_moments(
            uns,
            uns["group_cells"][g],
            uns["group_cells"][g].shape[0],
            uns["group_q"][g],
            uns["size_factor"][g],
            mesh=mesh,
        )
        for g in groups
    }

    # per-group gene masks (ref main.py:196-207)
    uns["gene_filter"] = {}
    uns["gene_rv_filter"] = {}
    for g in groups:
        cells = uns["group_cells"][g]
        obs_mean = np.asarray(cells.mean(axis=0)).ravel()
        expr_filter = (obs_mean > uns["filter_mean_thresh"]) & (
            uns["1d_moments"][g][1] > 0
        )
        uns["gene_filter"][g] = expr_filter
        obs_max = cells.max(axis=0).toarray().ravel() if sparse.issparse(
            cells
        ) else cells.max(axis=0)
        uns["gene_rv_filter"][g] = obs_max >= 2

    gene_masks = np.vstack([uns["gene_filter"][g] for g in groups])
    overall_gene_mask = gene_masks.mean(axis=0) > min_perc_group
    uns["overall_gene_filter"] = overall_gene_mask
    uns["gene_list"] = adata.var.index[overall_gene_mask].tolist()

    if filter_genes:
        uns["group_cells"] = {
            g: uns["group_cells"][g][:, overall_gene_mask] for g in groups
        }
        uns["1d_moments"] = {
            g: [
                uns["1d_moments"][g][0][overall_gene_mask],
                uns["1d_moments"][g][1][overall_gene_mask],
            ]
            for g in groups
        }
        uns["gene_rv_filter"] = {
            g: uns["gene_rv_filter"][g][overall_gene_mask] for g in groups
        }
        adata._inplace_subset_var(overall_gene_mask)

    # one shared mv-regressor fit on concatenated filtered moments
    # (ref main.py:231-245; the per-group fits there are identical by the
    # documented reference behavior)
    mean_concat = np.concatenate(
        [uns["1d_moments"][g][0][uns["gene_rv_filter"][g]] for g in groups]
    )
    var_concat = np.concatenate(
        [uns["1d_moments"][g][1][uns["gene_rv_filter"][g]] for g in groups]
    )
    shared_fit = fit_mv_regressor(mean_concat, var_concat)
    uns["mv_regressor"] = {"all": shared_fit}
    for g in groups:
        uns["mv_regressor"][g] = shared_fit

    for g in groups:
        res_var = _residual_variance_np(
            uns["1d_moments"][g][0], uns["1d_moments"][g][1],
            uns["mv_regressor"][g]
        )
        uns["1d_moments"][g].append(res_var)

    if gene_list is not None:
        assert type(gene_list) == list
        given = np.in1d(adata.var.index.values, gene_list)
        uns["group_cells"] = {
            g: uns["group_cells"][g][:, given] for g in groups
        }
        uns["1d_moments"] = {
            g: [
                uns["1d_moments"][g][0][given],
                uns["1d_moments"][g][1][given],
                uns["1d_moments"][g][2][given],
            ]
            for g in groups
        }
        uns["gene_rv_filter"] = {
            g: uns["gene_rv_filter"][g][given] for g in groups
        }
        adata._inplace_subset_var(given)

    if not inplace:
        return adata


# ---------------------------------------------------------------------------
# 2D moments  (ref main.py:277-338)
# ---------------------------------------------------------------------------


def get_corr_matrix(adata, group, mesh=None):
    """All-by-all correlation matrix for one group (ref ``main.py:277-291``),
    computed as blocked MXU matmuls on device.

    With ``mesh`` given (a 2-axis ``jax.sharding.Mesh``), the G x G output is
    sharded 2-D over the mesh so gene counts whose correlation matrix exceeds
    one device's memory still fit (see
    ``parallel.sharded.corr_matrix_sharded``).
    """
    uns = adata.uns["memento"]
    model = est.get_noise_model(uns["estimator_type"])
    if model is None:
        raise NotImplementedError(
            "get_corr_matrix requires a registry estimator_type"
        )
    args = (
        uns["group_cells"][group],
        uns["size_factor"][group],
        uns["group_q"][group],
        uns["1d_moments"][group][1],
        model,
    )
    if mesh is not None:
        from .parallel.sharded import corr_matrix_sharded

        return corr_matrix_sharded(mesh, *args)
    return corr_matrix_device(*args)


def compute_2d_moments(adata, gene_pairs, inplace=True):
    """Covariance / correlation for gene pairs (ref ``main.py:293-338``)."""
    if not inplace:
        adata = adata.copy()
    uns = adata.uns["memento"]
    if "size_factor" not in uns:
        _bin_size_factor_uns(adata)

    uns["2d_moments"] = {"gene_pairs": gene_pairs}
    mapping = dict(zip(adata.var.index.values, np.arange(adata.var.shape[0])))
    idx1 = np.array([mapping[a] for a, _ in gene_pairs], dtype=int)
    idx2 = np.array([mapping[b] for _, b in gene_pairs], dtype=int)
    uns["2d_moments"]["gene_idx_1"] = idx1
    uns["2d_moments"]["gene_idx_2"] = idx2

    et = uns["estimator_type"]
    model = est.get_noise_model(et)
    for g in uns["groups"]:
        cells = uns["group_cells"][g]
        if model is None:  # custom covariance estimator
            cov = et[1](
                data=cells.tocsc(),
                n_obs=cells.shape[0],
                q=uns["group_q"][g],
                size_factor=uns["size_factor"][g],
                idx1=idx1,
                idx2=idx2,
            )
        else:
            sf = uns["size_factor"][g]
            if not model.relative:
                sf = np.ones(cells.shape[0])
            cov = cov_sparse_pairs(cells, sf, uns["group_q"][g], idx1, idx2,
                                   model)
        var_1 = uns["1d_moments"][g][1][idx1]
        var_2 = uns["1d_moments"][g][1][idx2]
        corr = _corr_from_cov_np(cov, var_1, var_2)
        uns["2d_moments"][g] = {
            "cov": cov, "corr": corr, "var_1": var_1, "var_2": var_2
        }
    if not inplace:
        return adata


def _corr_from_cov_np(cov, var_1, var_2):
    """Host cov->corr with reference semantics (ref ``estimator.py:273-292``).

    The reference's 5.0 sentinel for invalid-variance entries is clipped by
    its own ``corr > 1`` step, so such entries come out as 1.0 (NOT NaN);
    |corr| == 1 is treated as invalid downstream (ref
    ``hypothesis_test.py:325``).  Pinned against the actual reference in
    ``tests/test_reference_parity.py``.
    """
    invalid = ~(var_1 > 0) | ~(var_2 > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = cov / np.sqrt(np.where(invalid, 1.0, var_1)
                             * np.where(invalid, 1.0, var_2))
    return np.where(invalid, 1.0, np.clip(corr, -1.0, 1.0))


# ---------------------------------------------------------------------------
# hypothesis testing  (ref main.py:341-520)
# ---------------------------------------------------------------------------


def _require_model(uns):
    """Resolve (model, custom_1d) for the batched device path.

    Custom ``(fn_1d, fn_cov)`` estimator tuples (ref ``estimator.py:31-32``)
    are supported when ``fn_1d`` is JAX-traceable: it is vmapped over gene
    tiles on materialized resample counts.
    """
    et = uns["estimator_type"]
    model = est.get_noise_model(et)
    if model is None:
        return est.HYPER_RELATIVE, et[0]  # model unused on the custom path
    return model, None


def _stack_group_arrays(uns, groups):
    true_mean = np.stack([uns["1d_moments"][g][0] for g in groups])
    true_res_var = np.stack([uns["1d_moments"][g][2] for g in groups])
    mv_coeffs = np.stack(
        [np.asarray(uns["mv_regressor"][g], dtype=np.float64) for g in groups]
    )
    q = np.array([uns["group_q"][g] for g in groups])
    nc = np.array([uns["group_cells"][g].shape[0] for g in groups])
    return true_mean, true_res_var, mv_coeffs, q, nc


def _ckpt_meta(uns, item_key, seed, num_boot, resampling, approx):
    """Run fingerprint stored in checkpoint blocks: a resumed block from a
    different dataset / item list / seed / bootstrap config raises instead
    of silently misassigning results (blocks are keyed by index only)."""
    import hashlib

    h = hashlib.sha256()
    h.update(item_key.encode())
    h.update(",".join(map(str, uns["groups"])).encode())
    h.update(str([uns["group_cells"][g].shape for g in uns["groups"]]).encode())
    return {
        "seed": int(seed),
        "num_boot": int(num_boot),
        "resampling": str(resampling),
        "approx": bool(approx),
        "data": h.hexdigest()[:16],
    }


def _distributed_checkpoint(checkpoint_dir, distributed):
    """Checkpoint layout for multi-controller runs.

    With ``distributed=True`` under a live ``jax.distributed`` runtime each
    process writes block files into its own ``proc{index}/`` subdirectory
    (no cross-process file races; every process holds the full merged
    result per block, so each copy is complete).  Resume is coordinated by
    an intersection all-reduce over the per-process have-vectors: a block
    any process is missing is recomputed by ALL of them, so every process
    stays inside the same collective calls (the DCN merge in
    ``run_ht_1d``/``run_ht_2d``).  Returns (dir, resume_filter).
    """
    if not distributed or jax.process_count() <= 1:
        return checkpoint_dir, None
    import os

    pid = jax.process_index()
    nproc = jax.process_count()
    ckpt_dir = os.path.join(checkpoint_dir, f"proc{pid}")

    def resume_filter(have):
        from .parallel.distributed import allreduce_hostsums

        total = allreduce_hostsums(np.asarray(have, np.float64))[0]
        return np.rint(total) >= nproc

    return ckpt_dir, resume_filter


def _per_gene_treatment(treatment, treatment_for_gene, gene_names, n_groups):
    """Build the padded per-gene treatment tensor and per-gene test counts.

    Returns (tensor [G, R, Ktmax] or None, nt_per_gene [G], col_names_per_gene).
    """
    if treatment_for_gene is None:
        return None, None, None
    gmax = max(len(v) for v in treatment_for_gene.values())
    g = len(gene_names)
    tens = np.zeros((g, n_groups, gmax))
    nt = np.zeros(g, dtype=int)
    cols = []
    for i, name in enumerate(gene_names):
        tx_cols = list(treatment_for_gene[name])
        nt[i] = len(tx_cols)
        cols.append(tx_cols)
        tens[i, :, : nt[i]] = treatment[tx_cols].values
    return tens, nt, cols


def ht_1d_moments(
    adata,
    covariate,
    treatment,
    treatment_for_gene=None,
    inplace=True,
    num_boot=10000,
    verbose=1,
    num_cpus=1,  # accepted for API parity; execution is device-parallel
    resampling="bootstrap",
    approx=False,
    resample_rep=False,
    sampler="auto",
    tile_size=None,
    boot_chunk=1024,
    seed=0,
    checkpoint_dir=None,
    checkpoint_block=4096,
    mesh=None,
    distributed=False,
    **kwargs,
):
    """Differential mean / variability testing (ref ``main.py:341-415``).

    With ``mesh`` given (a ``jax.sharding.Mesh`` with a ``model`` axis), the
    gene axis of every test tile is sharded over the mesh devices; the mesh
    must be process-local.  With ``distributed=True`` under a
    multi-controller ``jax.distributed`` runtime, gene tiles are
    round-robined over processes and the results merged with one DCN
    all-reduce — every process ends with identical results (see
    ``run_ht_1d``).

    ``covariate`` and ``treatment`` are per-group (sample-level) DataFrames
    aligned to ``uns['memento']['groups']`` order; ``treatment_for_gene``
    optionally maps gene name -> subset of treatment columns (eQTL mode).

    With ``checkpoint_dir`` given, genes run in ``checkpoint_block``-sized
    blocks persisted as ``.npz``; a crashed run resumes at the first
    unfinished block (the reference's production pattern at
    ``analysis/lupus/run_memento.py:92-113`` made first-class).  Block
    PRNG keys are derived from (seed, block start), so a resumed run is
    identical to an uninterrupted one with the same block size.
    """
    if not inplace:
        adata = adata.copy()
    uns = adata.uns["memento"]
    model, custom_1d = _require_model(uns)
    groups = uns["groups"]
    gene_names = adata.var.index
    g = len(gene_names)

    true_mean, true_res_var, mv_coeffs, q, _ = _stack_group_arrays(uns, groups)

    tx_tensor, nt_per_gene, tx_cols = _per_gene_treatment(
        treatment, treatment_for_gene, gene_names, len(groups)
    )
    treat_arg = tx_tensor if tx_tensor is not None else np.asarray(
        treatment.values, dtype=np.float64
    )

    def run_gene_block(start, stop):
        sl = slice(start, stop)
        full = start == 0 and stop == g  # avoid a full CSC copy
        return run_ht_1d(
            key=jax.random.fold_in(jax.random.key(seed), start),
            groups=[
                uns["group_cells"][grp] if full
                else uns["group_cells"][grp][:, sl]
                for grp in groups
            ],
            approx_sf=[uns["approx_size_factor"][grp] for grp in groups],
            true_mean=true_mean[:, sl],
            true_res_var=true_res_var[:, sl],
            mv_coeffs=mv_coeffs,
            q=q,
            covariate=np.asarray(covariate.values, dtype=np.float64),
            treatment=treat_arg[sl] if treat_arg.ndim == 3 else treat_arg,
            num_boot=num_boot,
            model=model,
            sampler=sampler,
            resampling=resampling,
            approx=approx,
            resample_rep=resample_rep,
            tile_size=tile_size,
            boot_chunk=boot_chunk,
            verbose=verbose > 0,
            custom_1d=custom_1d,
            mesh=mesh,
            distributed=distributed,
        )

    if checkpoint_dir is not None:
        from .utils.blocks import run_blocks

        ckpt_dir, resume_filter = _distributed_checkpoint(checkpoint_dir,
                                                          distributed)
        res = run_blocks(g, checkpoint_block, run_gene_block,
                         checkpoint_dir=ckpt_dir, name="1d_ht",
                         verbose=verbose > 0,
                         meta=_ckpt_meta(uns, ",".join(map(str, gene_names)),
                                         seed, num_boot, resampling, approx),
                         resume_filter=resume_filter)
    else:
        res = run_gene_block(0, g)

    # scatter [G, Kt] results into flat per-test arrays (ref main.py:399-404)
    if treatment_for_gene is None:
        num_tests = treatment.shape[1] * g
        nt_per_gene = np.full(g, treatment.shape[1], dtype=int)
    else:
        num_tests = int(nt_per_gene.sum())
    outs = {
        name: np.full(num_tests, np.nan)
        for name in ["mean_coef", "mean_se", "mean_asl", "var_coef", "var_se",
                     "var_asl"]
    }
    ci = 0
    key_map = {"mean_asl": "mean_pval", "var_asl": "var_pval"}
    for i in range(g):
        nt = nt_per_gene[i]
        for name in outs:
            src = res[key_map.get(name, name)]
            outs[name][ci : ci + nt] = src[i, :nt]
        ci += nt

    uns["1d_ht"] = {}
    if treatment_for_gene is not None:
        uns["1d_ht"]["treatment_for_gene"] = treatment_for_gene
    uns["1d_ht"]["treatment"] = treatment
    uns["1d_ht"]["covariate"] = covariate
    for name, arr in outs.items():
        uns["1d_ht"][name] = arr

    if not inplace:
        return adata


def ht_2d_moments(
    adata,
    covariate,
    treatment,
    treatment_for_gene=None,
    inplace=True,
    num_boot=10000,
    verbose=3,
    num_cpus=1,  # API parity; device-parallel underneath
    resampling="bootstrap",
    approx=False,
    resample_rep=False,
    sampler="auto",
    tile_size=None,
    boot_chunk=1024,
    seed=0,
    checkpoint_dir=None,
    checkpoint_block=4096,
    mesh=None,
    distributed=False,
    **kwargs,
):
    """Differential correlation testing (ref ``main.py:418-520``).

    ``checkpoint_dir`` persists per-block results for crash resume (see
    ``ht_1d_moments``); blocks run over the deduplicated pair list.  With
    ``mesh`` given, each tile's pair axis is sharded over the mesh's
    ``model`` axis (the reference fans pairs over the same worker pool as
    genes, ref ``main.py:501``)."""
    if not inplace:
        adata = adata.copy()
    uns = adata.uns["memento"]
    model, custom_1d = _require_model(uns)
    # custom (fn_1d, fn_cov) tuples run on materialized resample counts
    # inside the batched tile (ref bootstrap.py:141-155 custom-call shape)
    custom_est = (custom_1d, uns["estimator_type"][1]) \
        if custom_1d is not None else None
    groups = uns["groups"]

    gene_idx_1 = uns["2d_moments"]["gene_idx_1"]
    gene_idx_2 = uns["2d_moments"]["gene_idx_2"]
    n_conv = gene_idx_1.shape[0]

    # dedup unordered pairs; skip self-pairs (ref main.py:463-482)
    idx_mapping = {}
    uniq_pairs = []
    conv_true_corr = {
        g: uns["2d_moments"][g]["corr"] for g in groups
    }
    for conv_idx in range(n_conv):
        i1, i2 = int(gene_idx_1[conv_idx]), int(gene_idx_2[conv_idx])
        if i1 == i2:
            continue
        key = frozenset((i1, i2))
        if key in idx_mapping:
            idx_mapping[key].append(conv_idx)
            continue
        idx_mapping[key] = [conv_idx]
        uniq_pairs.append((i1, i2, conv_idx))

    corr_coef = np.full(n_conv, np.nan)
    corr_se = np.full(n_conv, np.nan)
    corr_asl = np.full(n_conv, np.nan)

    if uniq_pairs:
        p_idx1 = np.array([p[0] for p in uniq_pairs])
        p_idx2 = np.array([p[1] for p in uniq_pairs])
        conv_of_pair = [p[2] for p in uniq_pairs]

        true_corr = np.stack(
            [conv_true_corr[grp][conv_of_pair] for grp in groups]
        )
        q = np.array([uns["group_q"][grp] for grp in groups])

        if treatment_for_gene is not None:
            # evident-intent key: unordered gene-name pair (reference's
            # main.py:492 uses idx_1 twice — a documented bug)
            names = adata.var.index
            gmax = max(len(v) for v in treatment_for_gene.values())
            tens = np.zeros((len(uniq_pairs), len(groups), gmax))
            nt_per_pair_u = np.zeros(len(uniq_pairs), dtype=int)
            for i, (i1, i2, _) in enumerate(uniq_pairs):
                cols = list(
                    treatment_for_gene[frozenset((names[i1], names[i2]))]
                )
                nt_per_pair_u[i] = len(cols)
                tens[i, :, : len(cols)] = treatment[cols].values
            treat_arg = tens
        else:
            treat_arg = np.asarray(treatment.values, dtype=np.float64)
            nt_per_pair_u = None
            if treat_arg.ndim == 2 and treat_arg.shape[1] > 1:
                # the 2D result stores one statistic per pair (ref
                # hypothesis_test.py:367-415 returns a scalar); extra
                # columns would be computed and DISCARDED, so slice to the
                # reported column before dispatch — the regression treats
                # columns independently, so column 0's coef/SE/p are
                # unchanged.  (Corner: the per-pair one-sample check then
                # sees only column 0; the reference evaluates it on the
                # whole matrix.  The two differ only for pairs whose
                # surviving groups all carry treatment[:, 0] == 1 while
                # another column has non-1 entries — both conventions
                # produce degenerate output there.)
                import warnings

                warnings.warn(
                    f"ht_2d_moments received a {treat_arg.shape[1]}-column "
                    "treatment but the 2D result schema reports only the "
                    "FIRST treatment column (reference semantics, ref "
                    "hypothesis_test.py:367-415); run per-column or use "
                    "treatment_for_gene to select columns per pair",
                    UserWarning, stacklevel=2)
                treat_arg = treat_arg[:, :1]

        def run_pair_block(start, stop):
            sl = slice(start, stop)
            return run_ht_2d(
                key=jax.random.fold_in(jax.random.key(seed), start),
                groups=[uns["group_cells"][grp] for grp in groups],
                approx_sf=[uns["approx_size_factor"][grp] for grp in groups],
                idx1=p_idx1[sl],
                idx2=p_idx2[sl],
                true_corr=true_corr[:, sl],
                q=q,
                covariate=np.asarray(covariate.values, dtype=np.float64),
                treatment=treat_arg[sl] if treat_arg.ndim == 3 else treat_arg,
                num_boot=int(num_boot),
                model=model,
                sampler=sampler,
                resampling=resampling,
                approx=approx,
                resample_rep=resample_rep,
                tile_size=tile_size,
                boot_chunk=boot_chunk,
                verbose=verbose > 0,
                custom_est=custom_est,
                mesh=mesh,
                distributed=distributed,
            )

        if checkpoint_dir is not None:
            from .utils.blocks import run_blocks

            ckpt_dir, resume_filter = _distributed_checkpoint(
                checkpoint_dir, distributed)
            pair_key = ",".join(f"{a}:{b}" for a, b, _ in uniq_pairs)
            res = run_blocks(len(uniq_pairs), checkpoint_block,
                             run_pair_block, checkpoint_dir=ckpt_dir,
                             name="2d_ht", verbose=verbose > 0,
                             meta=_ckpt_meta(uns, pair_key, seed, num_boot,
                                             resampling, approx),
                             resume_filter=resume_filter)
        else:
            res = run_pair_block(0, len(uniq_pairs))

        # broadcast each unique pair's result to all duplicates
        for u, (i1, i2, _) in enumerate(uniq_pairs):
            for conv_idx in idx_mapping[frozenset((i1, i2))]:
                corr_coef[conv_idx] = res["corr_coef"][u, 0]
                corr_se[conv_idx] = res["corr_se"][u, 0]
                corr_asl[conv_idx] = res["corr_pval"][u, 0]

    uns["2d_ht"] = {}
    if treatment_for_gene is not None:
        uns["2d_ht"]["treatment_for_gene"] = treatment_for_gene
    uns["2d_ht"]["treatment"] = treatment
    uns["2d_ht"]["covariate"] = covariate
    uns["2d_ht"]["corr_coef"] = corr_coef
    uns["2d_ht"]["corr_se"] = corr_se
    uns["2d_ht"]["corr_asl"] = corr_asl

    if not inplace:
        return adata


# ---------------------------------------------------------------------------
# getters / persistence  (ref main.py:523-682)
# ---------------------------------------------------------------------------


def get_1d_moments(adata, groupby=None):
    """Per-group (optionally aggregated) log moments (ref ``main.py:523-582``)."""
    uns = adata.uns["memento"]
    moment_mean_df = pd.DataFrame({"gene": adata.var.index.tolist()})
    moment_var_df = pd.DataFrame({"gene": adata.var.index.tolist()})
    cell_counts = {k: v.shape[0] for k, v in uns["group_cells"].items()}
    with np.errstate(divide="ignore", invalid="ignore"):
        for group, val in uns["1d_moments"].items():
            if group == "all":
                continue
            moment_mean_df[group] = np.log(val[0])
            moment_var_df[group] = np.log(val[2])

    if groupby is None:
        return moment_mean_df, moment_var_df, cell_counts

    if groupby != "ALL":
        unique_groupby = adata.obs[groupby].astype(str).drop_duplicates().values
    else:
        unique_groupby = ["sg"]

    groupby_mean_df = pd.DataFrame({"gene": adata.var.index.tolist()})
    groupby_var_df = pd.DataFrame({"gene": adata.var.index.tolist()})
    for key in unique_groupby:
        gm = gv = 0
        gmc = gvc = 0
        with np.errstate(divide="ignore", invalid="ignore"):
            for group, val in uns["1d_moments"].items():
                if group == "all" or key not in group:
                    continue
                m = np.log(val[0])
                v = np.log(val[2])
                m[np.isnan(m)] = 0
                v[np.isnan(v)] = 0
                gm = gm + m * cell_counts[group]
                gmc = gmc + (val[0] > 0) * cell_counts[group]
                gv = gv + v * cell_counts[group]
                gvc = gvc + (val[2] > 0) * cell_counts[group]
        with np.errstate(divide="ignore", invalid="ignore"):
            groupby_mean_df[groupby + "_" + key] = gm / gmc
            groupby_var_df[groupby + "_" + key] = gv / gvc
    return groupby_mean_df.copy(), groupby_var_df.copy()


def get_2d_moments(adata, groupby=None):
    """Per-group (optionally aggregated) correlations (ref ``main.py:585-632``)."""
    uns = adata.uns["memento"]
    moment_corr_df = pd.DataFrame(
        uns["2d_moments"]["gene_pairs"], columns=["gene_1", "gene_2"]
    )
    cell_counts = {k: v.shape[0] for k, v in uns["group_cells"].items()}
    for group, val in uns["2d_moments"].items():
        if not isinstance(group, str) or "sg^" not in group:
            continue
        moment_corr_df[group] = val["corr"]

    if groupby is None:
        return moment_corr_df, cell_counts

    if groupby != "ALL":
        unique_groupby = adata.obs[groupby].astype(str).drop_duplicates().values
    else:
        unique_groupby = ["sg"]
    groupby_corr_df = pd.DataFrame(
        {
            "gene_1": moment_corr_df["gene_1"],
            "gene_2": moment_corr_df["gene_2"],
        }
    )
    for key in unique_groupby:
        gc = 0
        gcc = 0
        for group, val in uns["2d_moments"].items():
            if not isinstance(group, str) or "sg^" not in group:
                continue
            if key not in group:
                continue
            c = np.array(val["corr"], dtype=float)
            valid = ~np.isnan(c)
            c[np.isnan(c)] = 0
            gc = gc + c * cell_counts[group]
            gcc = gcc + valid * cell_counts[group]
        with np.errstate(divide="ignore", invalid="ignore"):
            groupby_corr_df[groupby + "_" + key] = gc / gcc
    return groupby_corr_df.copy()


def get_1d_ht_result(adata):
    """1D test results DataFrame (ref ``main.py:635-655``)."""
    uns = adata.uns["memento"]
    ht = uns["1d_ht"]
    if "treatment_for_gene" in ht:
        result_df = pd.concat(
            [
                pd.DataFrame(
                    itertools.product([g], ht["treatment_for_gene"][g]),
                    columns=["gene", "tx"],
                )
                for g in adata.var.index
            ]
        )
    else:
        result_df = pd.DataFrame(
            itertools.product(adata.var.index, ht["treatment"].columns),
            columns=["gene", "tx"],
        )
    result_df = result_df.reset_index(drop=True)
    result_df["de_coef"] = ht["mean_coef"]
    result_df["de_se"] = ht["mean_se"]
    result_df["de_pval"] = ht["mean_asl"]
    result_df["dv_coef"] = ht["var_coef"]
    result_df["dv_se"] = ht["var_se"]
    result_df["dv_pval"] = ht["var_asl"]
    return result_df


def get_2d_ht_result(adata):
    """2D test results DataFrame (ref ``main.py:658-670``)."""
    uns = adata.uns["memento"]
    result_df = pd.DataFrame(
        uns["2d_moments"]["gene_pairs"], columns=["gene_1", "gene_2"]
    )
    result_df["corr_coef"] = uns["2d_ht"]["corr_coef"]
    result_df["corr_se"] = uns["2d_ht"]["corr_se"]
    result_df["corr_pval"] = uns["2d_ht"]["corr_asl"]
    return result_df


def prepare_to_save(adata, keep=False):
    """Make ``uns['memento']`` serializable (ref ``main.py:673-682``, with
    the missing pickle import fixed)."""
    uns = adata.uns["memento"]
    for group in uns["groups"] + ["all"]:
        if not keep:
            del uns["mv_regressor"][group]
        else:
            uns["mv_regressor"][group] = str(
                pickle.dumps(uns["mv_regressor"][group])
            )
