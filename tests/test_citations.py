"""Reference-citation sweep: every `backend/...py` path cited anywhere
in repo source or docs must exist under /root/reference, and any cited
line numbers must be in-bounds. Guards against fabricated parity
citations (VERDICT r4 found one invented file) — in a repo whose SURVEY
is the authority on the reference's contents, an invented citation is
worse than none.
"""

from __future__ import annotations

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

# backend/app/foo/bar.py optionally followed by :12 or :12-34 / :12,34
CITE_RE = re.compile(r"\bbackend/[\w./-]+?\.py(?::(\d+)(?:[-,](\d+))?)?")


def _cited() -> list[tuple[str, str, int | None]]:
    """(citing file, cited path, max cited line or None) triples."""
    out = []
    for root, dirs, files in os.walk(REPO):
        dirs[:] = [
            d
            for d in dirs
            if d not in {".git", "spark-warehouse", "__pycache__", ".pytest_cache"}
        ]
        for fn in files:
            if not (fn.endswith(".py") or fn.endswith(".md")):
                continue
            # driver/judge-written artifacts quote findings verbatim —
            # only repo-authored claims are in scope
            if fn in {"VERDICT.md", "ADVICE.md"} or fn.startswith(
                ("BENCH", "CORRECTNESS", "COPYCHECK", "LEAKCHECK")
            ):
                continue
            path = os.path.join(root, fn)
            if os.path.abspath(path) == os.path.abspath(__file__):
                continue
            try:
                src = open(path, encoding="utf-8").read()
            except OSError:
                continue
            for m in CITE_RE.finditer(src):
                cited = m.group(0).split(":")[0]
                lines = [int(g) for g in m.groups() if g]
                out.append((path, cited, max(lines) if lines else None))
    return out


@pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not present")
def test_all_reference_citations_exist():
    cites = _cited()
    assert cites, "sweep found zero citations — regex or layout broke"
    missing, out_of_range = [], []
    for citing, cited, max_line in cites:
        target = os.path.join(REFERENCE, cited)
        if not os.path.isfile(target):
            missing.append(f"{os.path.relpath(citing, REPO)} cites {cited}")
            continue
        if max_line is not None:
            n = sum(1 for _ in open(target, encoding="utf-8", errors="replace"))
            if max_line > n:
                out_of_range.append(
                    f"{os.path.relpath(citing, REPO)} cites {cited}:{max_line} "
                    f"but the file has {n} lines"
                )
    assert not missing, "fabricated reference citations:\n" + "\n".join(sorted(set(missing)))
    assert not out_of_range, "out-of-range line citations:\n" + "\n".join(
        sorted(set(out_of_range))
    )
