"""Generate the four runnable tutorial notebooks into ``docs/tutorials/``.

Executable mirrors of the reference's four tutorial notebooks
(ref ``docs/source/tutorials/{ifn_mono_moments, ifn_mono_ht,
2d_one_sample_pbmc, genetics_tutorial}.ipynb``), rewritten for memento_tpu
against the shipped demo dataset (``examples/make_demo_h5ad.py``) instead of
the reference's absolute-path ``interferon_filtered.h5ad`` which does not
ship with either repo.

The notebooks read their inputs from environment variables so the test suite
can execute every code cell cheaply:

- ``MEMENTO_TPU_DEMO_H5AD``  path to the demo file (default
  ``demo_interferon_like.h5ad`` in the working directory)
- ``MEMENTO_TPU_NUM_BOOT``   bootstrap replicates (default 2000)

Usage: python examples/make_notebooks.py [outdir]
"""

import json
import os
import sys


def nb(cells):
    """Minimal nbformat-4 notebook from (kind, source) tuples."""
    out = []
    for kind, src in cells:
        cell = {
            "cell_type": kind,
            "metadata": {},
            "source": src.strip("\n").splitlines(keepends=True),
        }
        if kind == "code":
            cell["execution_count"] = None
            cell["outputs"] = []
        out.append(cell)
    return {
        "cells": out,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


PREAMBLE = """\
import os

import numpy as np
import pandas as pd

import memento_tpu as mt
from memento_tpu.io.h5ad import read_h5ad

DEMO = os.environ.get("MEMENTO_TPU_DEMO_H5AD", "demo_interferon_like.h5ad")
NUM_BOOT = int(os.environ.get("MEMENTO_TPU_NUM_BOOT", 2000))
"""


MOMENTS = nb([
    ("markdown", """\
# Estimating expression moments with `memento_tpu`

TPU-native mirror of the reference tutorial
`docs/source/tutorials/ifn_mono_moments.ipynb`: estimate the mean and
residual variance of true (pre-sequencing) expression per group, correcting
for capture noise with the hypergeometric model.

The demo dataset (`examples/make_demo_h5ad.py`) is an interferon-response
lookalike: two conditions (`stim`), several individuals (`ind`), two cell
types, with interferon-stimulated genes (`ISG*`) planted at a 2x mean
effect in the stimulated condition."""),
    ("code", PREAMBLE),
    ("markdown", "### Read the data and filter for monocytes"),
    ("code", """\
adata = read_h5ad(DEMO)
adata = adata[np.asarray(adata.obs["cell"].astype(str) == "CD14+ Monocytes")]
adata.obs[["ind", "stim", "cell"]].sample(5, random_state=0)"""),
    ("markdown", """\
### Set up memento and create groups

`setup_memento` estimates size factors (with the least-variable-gene mask
and shrinkage) and overall moments; `create_groups` slices cells into
`stim x ind` replicate groups."""),
    ("code", """\
mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                 trim_percent=0.3)
mt.create_groups(adata, label_columns=["stim", "ind"])
mt.compute_1d_moments(adata, min_perc_group=0.5)"""),
    ("markdown", "### Extract mean and residual-variance estimates per group"),
    ("code", """\
mean_df, var_df, cell_counts = mt.get_1d_moments(adata)
print(f"{mean_df.shape[0]} genes x {mean_df.shape[1] - 1} groups")
mean_df.head()"""),
    ("code", """\
# moments for one planted interferon-stimulated gene
gene = mean_df.gene[mean_df.gene.str.startswith("ISG")].iloc[0]
mean_df.query("gene == @gene")"""),
    ("code", 'var_df.query("gene == @gene")'),
    ("markdown", """\
### Compare conditions

Group labels encode the `label_columns`; aggregate the per-group log-means
by condition (the planted `ISG*` effect is ~log(2) = 0.69)."""),
    ("code", """\
ctrl_cols = [c for c in mean_df.columns if "^ctrl^" in c]
stim_cols = [c for c in mean_df.columns if "^stim^" in c]
isg = mean_df[mean_df.gene.str.startswith("ISG")]
delta = isg[stim_cols].mean(axis=1) - isg[ctrl_cols].mean(axis=1)
print("mean planted log-fold-change:", round(float(delta.mean()), 3))"""),
])


HT = nb([
    ("markdown", """\
# Differential mean and variability testing

TPU-native mirror of the reference tutorial
`docs/source/tutorials/ifn_mono_ht.ipynb`: the full protocol from setup to
1D hypothesis testing (differential mean / DE and differential
variability / DV), then a small 2D (differential correlation) run, and
saving results."""),
    ("code", PREAMBLE),
    ("markdown", "### Read data, set up memento, group by condition x individual"),
    ("code", """\
adata = read_h5ad(DEMO)
mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                 trim_percent=0.3)
mt.create_groups(adata, label_columns=["stim", "ind"])
mt.compute_1d_moments(adata, min_perc_group=0.5)"""),
    ("markdown", """\
### Build the sample-level design

`get_groups` returns one row per replicate group, in group order; covariate
and treatment DataFrames must be aligned to it (ref `ht_1d_moments`
semantics)."""),
    ("code", """\
groups = mt.get_groups(adata)
groups"""),
    ("code", """\
covariate = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
treatment = pd.DataFrame(
    {"stim": (groups["stim"].astype(str) == "stim").astype(float)},
    index=groups.index)"""),
    ("markdown", "### Run the 1D hypothesis test (bootstrap resampling)"),
    ("code", """\
mt.ht_1d_moments(adata, covariate=covariate, treatment=treatment,
                 num_boot=NUM_BOOT, resampling="bootstrap", tile_size=64)
result_1d = mt.get_1d_ht_result(adata)
result_1d.query("de_coef > 0").sort_values("de_pval").head(10)"""),
    ("code", """\
# planted ISG genes should dominate the DE ranking
isg = result_1d[result_1d.gene.str.startswith("ISG")]
print("median planted DE p-value:", float(np.nanmedian(isg.de_pval)))
print("median planted DE coef:", round(float(np.nanmedian(isg.de_coef)), 3),
      "(planted log-fc", round(float(np.log(2.0)), 3), ")")"""),
    ("code", """\
# differential variability ranking
result_1d.query("dv_coef > 0").sort_values("dv_pval").head(10)"""),
    ("markdown", "### 2D: differential correlation against an anchor gene"),
    ("code", """\
anchor = adata.var.index[0]
gene_pairs = [(anchor, g) for g in adata.var.index[1:6]]
mt.compute_2d_moments(adata, gene_pairs)
mt.ht_2d_moments(adata, covariate=covariate, treatment=treatment,
                 num_boot=NUM_BOOT, resampling="bootstrap", tile_size=64)
result_2d = mt.get_2d_ht_result(adata)
result_2d.sort_values("corr_pval").head(10)"""),
    ("markdown", "### Save your results"),
    ("code", """\
from memento_tpu.io.h5ad import write_h5ad

mt.prepare_to_save(adata)
write_h5ad("ifn_tutorial_out.h5ad", adata)
os.remove("ifn_tutorial_out.h5ad")"""),
])


ONE_SAMPLE_2D = nb([
    ("markdown", """\
# One-sample correlation testing

TPU-native mirror of the reference tutorial
`docs/source/tutorials/2d_one_sample_pbmc.ipynb`: test whether gene pairs
are significantly correlated *within* a condition (treatment = all ones,
so the statistic is the weighted-average correlation across replicate
groups and the bootstrap provides its null)."""),
    ("code", PREAMBLE),
    ("markdown", "### Read control cells only and group by individual"),
    ("code", """\
adata = read_h5ad(DEMO)
adata = adata[np.asarray(adata.obs["stim"].astype(str) == "ctrl")]
mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                 trim_percent=0.3)
mt.create_groups(adata, label_columns=["ind"])
mt.compute_1d_moments(adata, min_perc_group=0.5)"""),
    ("markdown", """\
### All pairs against one anchor ("TF") gene

The reference loops transcription factors and tests each against all other
genes; the demo runs one anchor against every other kept gene."""),
    ("code", """\
anchor = adata.var.index[0]
pairs = [(anchor, g) for g in adata.var.index if g != anchor]
mt.compute_2d_moments(adata, pairs)"""),
    ("code", """\
groups = mt.get_groups(adata)
ones = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
mt.ht_2d_moments(adata, covariate=ones, treatment=ones,
                 num_boot=NUM_BOOT, resampling="bootstrap", tile_size=64)
result = mt.get_2d_ht_result(adata)"""),
    ("markdown", "### Rank partners by correlation significance"),
    ("code", """\
result["logp"] = -np.log(result["corr_pval"])
result.sort_values("logp", ascending=False).head(10)"""),
    ("code", """\
n_sig = int((result.corr_pval < 0.05).sum())
print(f"{n_sig} / {len(result)} pairs significant at 0.05")"""),
])


GENETICS = nb([
    ("markdown", """\
# eQTL analysis (mean-only mode)

TPU-native mirror of the reference tutorial
`docs/source/tutorials/genetics_tutorial.ipynb`: many individuals, one
group per individual, SNP dosages as per-gene treatments
(`treatment_for_gene` maps each gene to its cis-SNP columns), and
`estimator_type='mean_only'` because only differential mean matters at
eQTL scale."""),
    ("code", PREAMBLE),
    ("markdown", "### Read data; one replicate group per individual"),
    ("code", """\
adata = read_h5ad(DEMO)
mt.setup_memento(adata, q_column="capture_q", filter_mean_thresh=0.01,
                 trim_percent=0.3, estimator_type="mean_only")
mt.create_groups(adata, label_columns=["ind"])
mt.compute_1d_moments(adata, min_perc_group=0.5)"""),
    ("markdown", """\
### Build SNP and covariate frames aligned to group (sample) order

Real runs read genotype dosage TSVs; the demo simulates three SNPs."""),
    ("code", """\
sample_order = mt.get_groups(adata)
rng = np.random.default_rng(0)
snps_df = pd.DataFrame(
    {f"snp{i}": rng.integers(0, 3, len(sample_order)).astype(float)
     for i in range(3)},
    index=sample_order.index)
cov_df = pd.DataFrame(np.ones((len(sample_order), 1)),
                      index=sample_order.index)
snps_df.head(5)"""),
    ("markdown", """\
### Map each gene to its cis-SNPs and run the test

With `treatment_for_gene`, each gene is tested only against its own SNP
columns (ref `analysis/lupus/run_memento.py` usage); permutation
resampling with the normal approximation is the eQTL-scale configuration."""),
    ("code", """\
genes = adata.var.index.tolist()
treatment_for_gene = {g: [f"snp{i % 3}", f"snp{(i + 1) % 3}"]
                      for i, g in enumerate(genes)}
mt.ht_1d_moments(adata, covariate=cov_df, treatment=snps_df,
                 treatment_for_gene=treatment_for_gene, num_boot=NUM_BOOT,
                 resampling="permutation", approx=True, tile_size=64)"""),
    ("code", """\
# mean-only mode: the dv_* columns are meaningless (ref tutorial notes)
result = mt.get_1d_ht_result(adata)
result.head(10)"""),
    ("code", """\
print(f"{len(result)} gene-SNP tests, "
      f"finite p fraction = {np.isfinite(result.de_pval).mean():.2f}")"""),
])



SCALING = nb([
    ("markdown", """\
# Scaling `memento_tpu`: device meshes, multi-host runs, checkpointing

The engine has two natural parallel axes (SURVEY.md §2.2): **cells**
(sufficient statistics are plain sums — data parallelism is exact) and
**genes / gene pairs** (tests are independent — model parallelism needs no
communication).  This tutorial shows the three scaling knobs of the public
API; everything here runs unchanged from 1 CPU device to a TPU pod slice.

| knob | what it does | when |
|---|---|---|
| `mesh=` | shard one process's work over its devices (GSPMD) | single controller: one host, 1-8 chips |
| `distributed=True` | round-robin gene/pair tiles over `jax.distributed` processes, merge with one DCN all-reduce | multi-host pods (e.g. v5p-16) |
| `checkpoint_dir=` | persist per-block results; resume after a crash | long production runs |"""),
    ("code", PREAMBLE),
    ("code", """\
import jax
from memento_tpu.parallel.mesh import make_mesh

# a (data, model) mesh over whatever devices this process has; with one
# device this is a 1x1 mesh and every path below still works unchanged
mesh = make_mesh()
mesh"""),
    ("markdown", """\
### Cell-sharded moments and gene-sharded tests

`setup_memento(mesh=...)` / `compute_1d_moments(mesh=...)` stream dense
cell blocks through `psum`-merged device reductions (exact — the moments
are sums), and `ht_1d_moments(mesh=...)` shards every test tile's gene
axis over the mesh's `model` axis with zero communication."""),
    ("code", """\
adata = read_h5ad(DEMO)
adata.obs["capture_q"] = 0.07
mt.setup_memento(adata, q_column="capture_q", estimator_type="hyper_relative",
                 mesh=mesh)
mt.create_groups(adata, label_columns=["stim"])
mt.compute_1d_moments(adata, min_perc_group=0.7, mesh=mesh)
adata.shape"""),
    ("code", """\
groups = mt.get_groups(adata)
cov = pd.DataFrame(np.ones((len(groups), 1)), index=groups.index)
tx = pd.DataFrame({"stim": (groups["stim"].astype(str) == "stim").astype(float)},
                  index=groups.index)
mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=NUM_BOOT,
                 resampling="bootstrap", mesh=mesh, tile_size=64)
mt.get_1d_ht_result(adata).head(5)"""),
    ("markdown", """\
### Multi-host execution

On a multi-host pod, start one process per host under `jax.distributed`
(`memento_tpu.parallel.distributed.initialize(...)`) and pass
`distributed=True`: gene tiles round-robin over processes (each running on
its local devices; per-tile RNG keys fold the GLOBAL tile offset, so the
merged result is bit-identical to a single-process run), and the disjoint
result rows merge with one DCN all-reduce.  With a single process it is a
no-op, so the same script runs anywhere:"""),
    ("code", """\
mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=NUM_BOOT,
                 resampling="bootstrap", distributed=True, tile_size=64)
res_dist = mt.get_1d_ht_result(adata)
float(np.isfinite(res_dist.de_pval).mean())"""),
    ("markdown", """\
For the input pipeline, each host loads only its own row range
(`parallel.distributed.process_row_range`) and
`stream_mean_var_multihost` produces exact global moments with one DCN
all-reduce of the per-host partial sums."""),
    ("markdown", """\
### Checkpoint / resume

Production runs (the reference's lupus eQTL blocks, for example) persist
per-block results; a crashed run resumes at the first unfinished block —
blocks carry a run fingerprint, so resuming with changed inputs raises
instead of silently mixing results."""),
    ("code", """\
import tempfile
ckpt = tempfile.mkdtemp(prefix="memento_ckpt_")
mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=NUM_BOOT,
                 resampling="bootstrap", checkpoint_dir=ckpt,
                 checkpoint_block=32, tile_size=64)
sorted(os.listdir(ckpt))[:3]"""),
    ("code", """\
# a re-run with the same inputs resumes from the completed blocks
mt.ht_1d_moments(adata, covariate=cov, treatment=tx, num_boot=NUM_BOOT,
                 resampling="bootstrap", checkpoint_dir=ckpt,
                 checkpoint_block=32, tile_size=64)
mt.get_1d_ht_result(adata).head(3)"""),
    ("markdown", """\
### The G x G correlation matrix

`get_corr_matrix` accumulates a blocked MXU Gram product on device (int8
compact transport for the cell blocks; Kahan-compensated f32 sums; f64
finish on host in bounded row blocks).  With a 2-axis mesh the G x G
output shards over BOTH axes (`parallel.sharded.corr_matrix_sharded`) for
gene counts beyond one device's memory — measured at 20k genes x 100k
cells in `CORR_NS_r04.json`."""),
    ("code", """\
corr = mt.get_corr_matrix(adata, mt.get_groups(adata).index[0])
corr.shape, float(np.nanmean(np.abs(corr[np.triu_indices(corr.shape[0], 1)])))"""),
    ("markdown", """\
Further reading: `docs/performance.md` (measured scaling axes, the cascade
kernel roofline, multi-host design), `PARITY.md` (component map),
`tests/test_distributed_ht.py` (the 2-process bit-parity proof)."""),
])


NOTEBOOKS = {
    "ifn_moments.ipynb": MOMENTS,
    "ifn_ht.ipynb": HT,
    "one_sample_2d.ipynb": ONE_SAMPLE_2D,
    "genetics_eqtl.ipynb": GENETICS,
    "scaling.ipynb": SCALING,
}


def main(outdir):
    os.makedirs(outdir, exist_ok=True)
    for name, notebook in NOTEBOOKS.items():
        path = os.path.join(outdir, name)
        with open(path, "w") as f:
            json.dump(notebook, f, indent=1)
            f.write("\n")
        print("wrote", path)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "docs", "tutorials")
    main(os.path.abspath(out))
