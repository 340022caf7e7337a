"""Real multi-host smoke test: a 2-process ``jax.distributed`` launch on CPU
devices (gloo collectives), each process ingesting only its own row range,
must reproduce the single-host moments exactly.

This is the per-process input-pipeline path of SURVEY.md §2.2 ("DCN only
between hosts for the streaming input pipeline") made concrete — VERDICT r1
missing item #2.
"""

import os
import subprocess
import sys
from pathlib import Path

from conftest import free_port, scrubbed_env

REPO = Path(__file__).resolve().parent.parent

WORKER = """
import sys
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
import numpy as np, scipy.sparse as sparse
import jax
from memento_tpu.parallel import distributed as dist

dist.initialize(coordinator_address="localhost:" + port,
                num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc

# every process simulates the SAME global dataset (seeded), then keeps only
# its own row range — stand-in for per-host file ingestion
rng = np.random.default_rng(0)
n, g = 3000, 20
lam = np.exp(rng.uniform(np.log(0.05), np.log(5.0), g))
X = rng.poisson(lam, size=(n, g)).astype(np.float64)
sf = X.sum(1) + 1.0
sf /= sf.mean()

start, stop = dist.process_row_range(n)
ranges = [dist.process_row_range(n, process_id=i, num_processes=nproc)
          for i in range(nproc)]
assert ranges[0][0] == 0 and ranges[-1][1] == n
for (a, b), (c, d) in zip(ranges, ranges[1:]):
    assert b == c

X_local = sparse.csr_matrix(X[start:stop])
sf_local = sf[start:stop]

from memento_tpu.ops.estimators import HYPER_RELATIVE, mean_var_from_suffstats

m, v = dist.stream_mean_var_multihost(
    X_local, sf_local, n_obs_global=n, q=0.1, model=HYPER_RELATIVE,
    block=512)

# single-host f64 oracle over the full matrix
w = 1.0 / sf
s1 = w @ X
s2 = (w * w) @ (X * X)
s1sq = (w * w) @ X
m_ref, v_ref = mean_var_from_suffstats(s1, s2, s1sq, n, 0.1, HYPER_RELATIVE)
np.testing.assert_allclose(m, m_ref, rtol=1e-12)
np.testing.assert_allclose(v, v_ref, rtol=1e-9)

# fast (f32 hi/lo) collective stays accurate
mf, vf = dist.stream_mean_var_multihost(
    X_local, sf_local, n_obs_global=n, q=0.1, model=HYPER_RELATIVE,
    block=512, precision="fast")
np.testing.assert_allclose(mf, m_ref, rtol=1e-5)
np.testing.assert_allclose(vf, v_ref, rtol=1e-2, atol=1e-5)

print(f"proc {pid} ok", flush=True)
"""


def test_two_process_streaming_matches_single_host():
    env = scrubbed_env(2)  # 2 CPU devices per process -> 4 global
    port = free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), "2", port],
            env=env,
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed\nstdout:\n{out}\nstderr:\n{err[-3000:]}"
    assert "proc 0 ok" in outs[0][1]
    assert "proc 1 ok" in outs[1][1]
