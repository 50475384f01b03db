"""tools/bench_diff.py layout tagging (round-10 VERDICT item 2): two
rounds in a row, in-place fixture regeneration with a different
parquet physical layout produced bench movers that were adjudicated as
if they were code regressions. The bench record now carries a
per-table layout fingerprint and the diff protocol tags flags as
layout-change when it moved."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run_diff(tmp_path, old, new):
    for name, rec in [("old.json", old), ("new.json", new)]:
        (tmp_path / name).write_text(json.dumps(rec) + "\n")
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "bench_diff.py"),
         str(tmp_path / "old.json"), str(tmp_path / "new.json")],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def test_layout_change_tags_flags(tmp_path):
    base = {"queries": {"a": 1.0}, "query_mad": {"a": 0.01}}
    lay1 = {"documents": {"rows": 100, "row_groups": 4, "files": 1}}
    lay2 = {"documents": {"rows": 100, "row_groups": 1, "files": 1}}
    r = _run_diff(
        tmp_path,
        {**base, "layout": lay1},
        {"queries": {"a": 3.0}, "query_mad": {"a": 0.01}, "layout": lay2},
    )
    assert r["layout"] == "changed"
    assert r["layout_changed_tables"] == ["documents"]
    assert r["regressions"][0]["tag"] == "layout-change"


def test_layout_same_and_unknown(tmp_path):
    lay = {"documents": {"rows": 100, "row_groups": 4, "files": 1}}
    same = _run_diff(
        tmp_path,
        {"queries": {"a": 1.0}, "query_mad": {"a": 0.01}, "layout": lay},
        {"queries": {"a": 3.0}, "query_mad": {"a": 0.01}, "layout": lay},
    )
    assert same["layout"] == "same"
    assert "tag" not in same["regressions"][0]
    unknown = _run_diff(
        tmp_path,
        {"queries": {"a": 1.0}, "query_mad": {"a": 0.01}},  # pre-r11 record
        {"queries": {"a": 1.0}, "query_mad": {"a": 0.01}, "layout": lay},
    )
    assert unknown["layout"] == "unknown"


def test_bench_layout_fingerprint_reads_fixture_dir():
    """bench._layout must fingerprint every fixture table with
    rows/row_groups/files — the record key BENCH_r11+ carries."""
    sys.path.insert(0, str(ROOT))
    import bench

    lay = bench._layout("/root/testdata/sf0.001")
    assert "documents" in lay and "lineitem" in lay
    for t, d in lay.items():
        assert set(d) == {"rows", "row_groups", "files", "bytes"}, (t, d)
        assert d["rows"] > 0 and d["row_groups"] >= 1 and d["files"] >= 1
        # bytes is the content proxy: a same-layout regeneration with
        # different data must still move the fingerprint
        assert d["bytes"] > 0


def test_layout_schema_migration_compares_shared_keys(tmp_path):
    """A record written before the `bytes` dimension existed must diff
    as `same` against a post-migration record when every SHARED
    dimension (rows/row_groups/files) is equal — the one-time schema
    change is not a fixture change."""
    pre = {"documents": {"rows": 100, "row_groups": 4, "files": 1}}
    post = {
        "documents": {"rows": 100, "row_groups": 4, "files": 1, "bytes": 999}
    }
    r = _run_diff(
        tmp_path,
        {"queries": {"a": 1.0}, "query_mad": {"a": 0.01}, "layout": pre},
        {"queries": {"a": 3.0}, "query_mad": {"a": 0.01}, "layout": post},
    )
    assert r["layout"] == "same"
    # but a shared-dimension move still flags
    post2 = {
        "documents": {"rows": 100, "row_groups": 1, "files": 1, "bytes": 999}
    }
    r2 = _run_diff(
        tmp_path,
        {"queries": {"a": 1.0}, "query_mad": {"a": 0.01}, "layout": pre},
        {"queries": {"a": 3.0}, "query_mad": {"a": 0.01}, "layout": post2},
    )
    assert r2["layout"] == "changed"


def test_disjoint_fingerprint_schemas_read_as_changed(tmp_path):
    """Round-11 ADVICE item 1: when one record holds an {"error": ...}
    entry and the other full stats, the shared-key set is empty — the
    table state is NOT comparable and must be reported as changed,
    never as layout "same"."""
    err = {"documents": {"error": "unreadable"}}
    full = {"documents": {"rows": 100, "row_groups": 4, "files": 1}}
    r = _run_diff(
        tmp_path,
        {"queries": {"a": 1.0}, "query_mad": {"a": 0.01}, "layout": err},
        {"queries": {"a": 3.0}, "query_mad": {"a": 0.01}, "layout": full},
    )
    assert r["layout"] == "changed"
    assert r["layout_changed_tables"] == ["documents"]
    assert r["regressions"][0]["tag"] == "layout-change"
