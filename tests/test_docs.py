"""The committed API reference stays in sync with the live docstrings."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_reference_in_sync():
    sys.path.insert(0, os.path.join(REPO, "examples"))
    try:
        import make_api_reference
    finally:
        sys.path.pop(0)
    want = make_api_reference.render()
    with open(os.path.join(REPO, "docs", "api.md")) as f:
        got = f.read()
    assert got == want, (
        "docs/api.md is stale — regenerate with "
        "`python examples/make_api_reference.py`")
