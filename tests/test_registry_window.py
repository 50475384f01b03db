"""Machine check of the driver-window bookkeeping (round-6 ADVICE
item 2 / VERDICT item 6: the 50-entry window decides what the driver
verifies each round, so its composition must be asserted, not
hand-counted — round 6 shipped a comment that was wrong twice).

The composition is derived from ground truth: the committed
CORRECTNESS_r*.json driver records (pinned to the rounds the window
was designed against, so the test stays stable when the NEXT round's
record lands) plus the registry itself. WINDOW_SECTIONS triples carry
the expected last-driver-green round per section (None = this round's
additions, never driver-seen), so this file needs no per-round edits
beyond DESIGN_ROUNDS.
"""

from __future__ import annotations

import json
import pathlib

from flight_events_flink_job_spark.plans import (
    DRIVER_WINDOW,
    QUERIES,
    TAIL_STALE_ROUND,
    WINDOW_SECTIONS,
    _PRIORITY,
)

ROOT = pathlib.Path(__file__).resolve().parent.parent
# The window was designed against the driver state as of round 12;
# later records (r13+) must not flip the assertions.
DESIGN_ROUNDS = range(1, 13)


def _last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for r in DESIGN_ROUNDS:
        path = ROOT / f"CORRECTNESS_r{r:02d}.json"
        if not path.exists():
            continue
        for name, row in json.loads(path.read_text()).items():
            if isinstance(row, dict) and row.get("err") is None:
                last[name] = r
    return last


def test_priority_names_resolve_and_are_unique():
    assert len(set(_PRIORITY)) == len(_PRIORITY)
    unknown = [n for n in _PRIORITY if n not in QUERIES]
    assert not unknown, f"priority list names unregistered queries: {unknown}"


def test_registry_order_starts_with_priority():
    assert list(QUERIES)[: len(_PRIORITY)] == _PRIORITY


def test_window_sections_sum_to_window():
    assert sum(n for _, n, _ in WINDOW_SECTIONS) == DRIVER_WINDOW
    assert len(_PRIORITY) >= DRIVER_WINDOW


def test_window_composition_matches_driver_history():
    """Each WINDOW_SECTIONS run, in order, must consist of queries
    whose latest driver-green round (over DESIGN_ROUNDS) equals the
    section's declared round — or, for the additions section (round
    None), of queries the driver has never recorded."""
    last = _last_green()
    window = _PRIORITY[:DRIVER_WINDOW]
    pos = 0
    for label, count, expect in WINDOW_SECTIONS:
        run = window[pos : pos + count]
        assert len(run) == count, (label, run)
        for q in run:
            if expect is None:
                assert q not in last, (
                    f"{q} listed under '{label}' but driver-seen "
                    f"r{last.get(q)}"
                )
            else:
                assert last.get(q) == expect, (
                    f"{q} expected r{expect}-stale under '{label}', "
                    f"last green r{last.get(q)}"
                )
        pos += count


def test_queued_tail_is_the_remaining_stalest_set():
    """Everything queued past the window cutoff must be exactly the
    TAIL_STALE_ROUND-stale queries NOT rotated in — no query can sit
    in limbo (neither in the window nor queued nor fresher)."""
    last = _last_green()
    tail = _PRIORITY[DRIVER_WINDOW:]
    for q in tail:
        assert last.get(q) == TAIL_STALE_ROUND, (
            f"queued {q} expected r{TAIL_STALE_ROUND}-stale, "
            f"last green r{last.get(q)}"
        )
    window = set(_PRIORITY[:DRIVER_WINDOW])
    all_stale = {
        q
        for q, r in last.items()
        if r == TAIL_STALE_ROUND and q in QUERIES
    }
    assert all_stale - window == set(tail)
