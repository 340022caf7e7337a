"""Block-wise execution with checkpoint/resume (aux subsystem).

The reference has no in-library checkpointing; production runs shard gene
lists into blocks across invocations and write per-block results
(ref ``/root/reference/analysis/lupus/run_memento.py:92-113``).  This module
makes that pattern first-class: split the tests into gene blocks, persist
each block's results as ``.npz`` as soon as it completes, and skip finished
blocks on re-invocation — a crash resumes where it left off.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Dict, Optional

import numpy as np


def _block_path(checkpoint_dir: str, name: str, idx: int) -> str:
    return os.path.join(checkpoint_dir, f"{name}_block{idx:05d}.npz")


def _check_meta(path: str, saved: str, expected: dict) -> None:
    got = json.loads(saved)
    if got != expected:
        diffs = sorted(
            k for k in set(got) | set(expected) if got.get(k) != expected.get(k)
        )
        raise ValueError(
            f"checkpoint {path} was written by a different run "
            f"(mismatched: {diffs}). Resuming would silently misassign "
            "results; delete the checkpoint dir (or call clear_checkpoints) "
            "to recompute."
        )


def run_blocks(
    n_items: int,
    block_size: int,
    run_block: Callable[[int, int], Dict[str, np.ndarray]],
    checkpoint_dir: Optional[str] = None,
    name: str = "ht",
    verbose: bool = False,
    meta: Optional[dict] = None,
    resume_filter: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> Dict[str, np.ndarray]:
    """Run ``run_block(start, stop)`` over blocks with resume support.

    Args:
      n_items: total genes / pairs.
      block_size: items per block.
      run_block: computes a dict of per-item arrays (first axis = items in
        the block).
      checkpoint_dir: if given, each block is saved there and finished
        blocks are loaded instead of recomputed.
      meta: JSON-serializable run fingerprint (seed, num_boot, item-list
        hash, ...).  Saved inside every block; a resumed block whose saved
        fingerprint differs raises instead of silently concatenating stale
        results from a different run (blocks are keyed by index only).
      resume_filter: optional hook for multi-controller runs — receives the
        LOCAL bool vector of on-disk block files and returns the effective
        resume vector.  Distributed callers all-reduce it to the
        intersection across processes: a block any process is missing is
        recomputed by ALL of them, keeping every process inside the same
        collective calls.  Blocks marked resumable locally but vetoed by
        the filter are recomputed (and re-written).

    Returns:
      dict of concatenated arrays over all items.
    """
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)

    full_meta = dict(meta or {})
    full_meta["n_items"] = int(n_items)
    full_meta["block_size"] = int(block_size)

    starts = list(range(0, n_items, block_size))
    if checkpoint_dir is not None:
        resumable = np.array([
            os.path.exists(_block_path(checkpoint_dir, name, bi))
            for bi in range(len(starts))
        ])
        if resume_filter is not None:
            resumable = np.asarray(resume_filter(resumable), bool)
    else:
        resumable = np.zeros(len(starts), bool)

    pieces = []
    for bi, start in enumerate(starts):
        stop = min(start + block_size, n_items)
        block_meta = dict(full_meta, start=start, stop=stop)
        path = _block_path(checkpoint_dir, name, bi) if checkpoint_dir else None
        if path is not None and resumable[bi]:
            with np.load(path) as z:
                block = {k: z[k] for k in z.files}
            saved = block.pop("__meta__", None)
            if saved is None:
                raise ValueError(
                    f"checkpoint {path} has no run metadata (pre-r2 format); "
                    "delete the checkpoint dir to recompute."
                )
            _check_meta(path, str(saved), block_meta)
            if verbose:
                print(f"[blocks] resumed block {bi} ({start}:{stop})")
        else:
            block = run_block(start, stop)
            if path is not None:
                tmp = path + ".tmp"
                np.savez(tmp, __meta__=json.dumps(block_meta), **block)
                os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                           path)
            if verbose:
                print(f"[blocks] computed block {bi} ({start}:{stop})")
        pieces.append(block)

    keys = pieces[0].keys() if pieces else []
    return {k: np.concatenate([p[k] for p in pieces], axis=0) for k in keys}


def clear_checkpoints(checkpoint_dir: str, name: str = "ht") -> int:
    """Remove saved blocks; returns the number deleted."""
    n = 0
    if not os.path.isdir(checkpoint_dir):
        return 0
    for f in os.listdir(checkpoint_dir):
        if f.startswith(f"{name}_block") and f.endswith(".npz"):
            os.remove(os.path.join(checkpoint_dir, f))
            n += 1
    return n


__all__ = ["run_blocks", "clear_checkpoints"]
