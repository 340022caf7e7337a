"""Generate docs/api.md — the API reference — from the live docstrings.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/make_api_reference.py

The reference ships Sphinx docs (`/root/reference/docs/source/conf.py`);
this repo's equivalent is a generated markdown reference (Sphinx is not in
the image).  Run after changing public signatures; `tests/test_docs.py`
checks the committed file is in sync with the code.
"""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODULES = [
    ("memento_tpu", "Public API (the reference's 13 entry points + shims)"),
    ("memento_tpu.api", None),
    ("memento_tpu.ops.estimators", None),
    ("memento_tpu.ops.compress", None),
    ("memento_tpu.ops.sampling", None),
    ("memento_tpu.ops.bootstrap", None),
    ("memento_tpu.ops.pallas_kernels", None),
    ("memento_tpu.ops.size_factor", None),
    ("memento_tpu.ops.mv_regression", None),
    ("memento_tpu.ops.corr", None),
    ("memento_tpu.inference.ht", None),
    ("memento_tpu.inference.regression", None),
    ("memento_tpu.inference.asl", None),
    ("memento_tpu.inference.gev", None),
    ("memento_tpu.parallel.sharded", None),
    ("memento_tpu.parallel.distributed", None),
    ("memento_tpu.parallel.streaming", None),
    ("memento_tpu.parallel.mesh", None),
    ("memento_tpu.models.simulate", None),
    ("memento_tpu.io.h5ad", None),
    ("memento_tpu.utils.stats", None),
    ("memento_tpu.utils.blocks", None),
    ("memento_tpu.utils.profiling", None),
    ("memento_tpu.utils.roofline", None),
]


def _first_paragraph(doc):
    if not doc:
        return "(no docstring)"
    lines = []
    for ln in inspect.cleandoc(doc).splitlines():
        if not ln.strip() and lines:
            break
        if ln.strip():
            lines.append(ln.strip())
    return " ".join(lines)


def _signature(obj):
    try:
        return str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"


def _public_members(mod):
    names = getattr(mod, "__all__", None)
    if names is None:
        names = [n for n in vars(mod) if not n.startswith("_")]
    out = []
    for n in names:
        obj = getattr(mod, n, None)
        if obj is None:
            continue
        if inspect.isfunction(obj) or inspect.isclass(obj):
            if getattr(obj, "__module__", "").startswith("memento_tpu"):
                out.append((n, obj))
    return out


def render() -> str:
    parts = [
        "# API reference\n",
        "Generated from docstrings by `examples/make_api_reference.py` — "
        "do not edit by hand.  Every entry links the implementing module; "
        "reference-parity citations (file:line into `/root/reference`) "
        "live in the full docstrings.\n",
    ]
    for mod_name, note in MODULES:
        mod = importlib.import_module(mod_name)
        parts.append(f"\n## `{mod_name}`\n")
        if note:
            parts.append(note + "\n")
        head = _first_paragraph(mod.__doc__)
        parts.append(f"{head}\n")
        for n, obj in _public_members(mod):
            kind = "class" if inspect.isclass(obj) else "def"
            sig = "" if inspect.isclass(obj) else _signature(obj)
            parts.append(f"- **`{kind} {n}{sig}`** — "
                         f"{_first_paragraph(obj.__doc__)}")
        parts.append("")
    return "\n".join(parts)


def main():
    text = render()
    out = os.path.join(os.path.dirname(__file__), "..", "docs", "api.md")
    with open(out, "w") as f:
        f.write(text)
    print(f"wrote {os.path.normpath(out)} ({len(text)} chars)")


if __name__ == "__main__":
    main()
