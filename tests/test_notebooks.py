"""Execute every code cell of the shipped tutorial notebooks.

The four notebooks in ``docs/tutorials/`` are the runnable mirrors of the
reference's ``docs/source/tutorials/`` notebooks (C25).  This test runs each
notebook's code cells in order, in one namespace per notebook, against a
small generated demo file — the notebooks themselves read the file path and
bootstrap count from environment variables.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
NB_DIR = REPO / "docs" / "tutorials"
NAMES = ["ifn_moments.ipynb", "ifn_ht.ipynb", "one_sample_2d.ipynb",
         "genetics_eqtl.ipynb", "scaling.ipynb"]


@pytest.fixture(scope="module")
def demo_h5ad(tmp_path_factory):
    path = tmp_path_factory.mktemp("nb") / "demo.h5ad"
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    r = subprocess.run(
        [sys.executable, str(REPO / "examples" / "make_demo_h5ad.py"),
         str(path), "--cells-per-group", "150"],
        capture_output=True, text=True, timeout=120, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    return path


def test_notebooks_in_sync_with_generator(tmp_path):
    """The committed notebooks match the generator's output exactly."""
    sys.path.insert(0, str(REPO / "examples"))
    try:
        import make_notebooks
    finally:
        sys.path.pop(0)
    make_notebooks.main(str(tmp_path))
    for name in NAMES:
        committed = json.loads((NB_DIR / name).read_text())
        generated = json.loads((tmp_path / name).read_text())
        assert committed == generated, f"{name} drifted from the generator"


@pytest.mark.parametrize("name", NAMES)
def test_notebook_executes(name, demo_h5ad, monkeypatch, tmp_path):
    notebook = json.loads((NB_DIR / name).read_text())
    monkeypatch.setenv("MEMENTO_TPU_DEMO_H5AD", str(demo_h5ad))
    monkeypatch.setenv("MEMENTO_TPU_NUM_BOOT", "200")
    monkeypatch.chdir(tmp_path)  # notebooks write/delete scratch output files
    ns = {"__name__": "__main__"}
    for i, cell in enumerate(notebook["cells"]):
        if cell["cell_type"] != "code":
            continue
        src = "".join(cell["source"])
        try:
            exec(compile(src, f"{name}[cell {i}]", "exec"), ns)
        except Exception as e:  # pragma: no cover - failure reporting
            pytest.fail(f"{name} cell {i} failed: {e!r}\n--- cell ---\n{src}")
