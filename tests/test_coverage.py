"""COVERAGE.md freshness pin (round-7 VERDICT item 6): the generated
registry-inventory section must match a fresh regeneration from the
registry + driver records — any query added, renamed, or re-oracled
without running tools/gen_coverage.py fails here."""

from __future__ import annotations

import os
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT / "tools"))


def test_coverage_generated_section_is_fresh():
    import gen_coverage

    text = (ROOT / "COVERAGE.md").read_text()
    assert gen_coverage.BEGIN in text and gen_coverage.END in text
    assert gen_coverage.regenerate(text) == text, (
        "COVERAGE.md is stale — run: python tools/gen_coverage.py"
    )


def test_coverage_header_is_not_stale_rounds_old():
    """The header must name the round whose CORRECTNESS record is the
    newest committed one + 1 (the round being built) or that record's
    own round — never older."""
    import re

    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(r"Round-(\d+) status", text)
    assert m, "COVERAGE.md header lost its round marker"
    newest = max(
        int(re.search(r"r(\d+)", p.name).group(1))
        for p in ROOT.glob("CORRECTNESS_r*.json")
    )
    assert int(m.group(1)) >= newest, (
        f"header says round {m.group(1)}, newest driver record is r{newest}"
    )
