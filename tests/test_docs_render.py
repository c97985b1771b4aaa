"""Docs-vs-artifacts drift gate: every perf number in README.md /
COMPONENTS.md is a token rendered from the committed bench JSONs by
tools/render_docs.py. Hand-edited numbers, or a refreshed artifact
without a re-render, fail here (VERDICT r2+r3 both flagged exactly
this drift)."""

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_docs_match_artifacts():
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "render_docs.py"),
         "--check"], capture_output=True, text=True)
    assert r.returncode == 0, (
        "docs drifted from bench artifacts; run "
        "`python tools/render_docs.py`:\n" + r.stderr)


def test_docs_have_tokens():
    """The gate only bites while the tokens exist — a doc rewrite that
    drops them would silently disable the check."""
    for doc, least in (("README.md", 5), ("COMPONENTS.md", 4)):
        with open(os.path.join(ROOT, doc)) as fh:
            n = fh.read().count("<!--v:")
        assert n >= least, f"{doc}: only {n} render tokens left"
