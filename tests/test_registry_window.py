"""Machine check of the driver-window bookkeeping (round-6 ADVICE
item 2 / VERDICT item 6: the 50-entry window decides what the driver
verifies each round, so its composition must be asserted, not
hand-counted — round 6 shipped a comment that was wrong twice).

The composition is derived from ground truth: the committed
CORRECTNESS_r*.json driver records (pinned to the rounds the window
was designed against, so the test stays stable when the NEXT round's
record lands) plus the registry itself.
"""

from __future__ import annotations

import json
import pathlib

from flight_events_flink_job_spark.plans import (
    DRIVER_WINDOW,
    QUERIES,
    WINDOW_SECTIONS,
    _PRIORITY,
)

ROOT = pathlib.Path(__file__).resolve().parent.parent
# The window was designed against the driver state as of round 6;
# later records (r07+) must not flip the assertions.
DESIGN_ROUNDS = range(1, 7)


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
    assert sum(n for _, n in WINDOW_SECTIONS) == DRIVER_WINDOW
    assert len(_PRIORITY) >= DRIVER_WINDOW


def test_window_composition_matches_driver_history():
    """The window splits into the WINDOW_SECTIONS runs, in order:
    round additions first (no driver record through the design round),
    then the stalest family, then the next — the exact counts come
    from WINDOW_SECTIONS, never hand-counted here (round-7 ADVICE
    item 5: the previous docstring hard-coded stale indices)."""
    last = _last_green()
    window = _PRIORITY[:DRIVER_WINDOW]
    (_, n_new), (_, n_r3), (_, n_r4) = WINDOW_SECTIONS
    adds = window[:n_new]
    stale3 = window[n_new : n_new + n_r3]
    stale4 = window[n_new + n_r3 :]
    assert len(stale4) == n_r4
    for q in adds:
        assert q not in last, f"{q} listed as an addition but driver-seen r{last.get(q)}"
    for q in stale3:
        assert last.get(q) == 3, f"{q} expected r3-stale, last green r{last.get(q)}"
    for q in stale4:
        assert last.get(q) == 4, f"{q} expected r4-stale, last green r{last.get(q)}"


def test_queued_tail_is_the_remaining_r4_stale_set():
    """Everything queued past the window cutoff must be exactly the
    r4-stale queries NOT rotated in — no query can sit in limbo
    (neither in the window nor queued nor fresher than r4)."""
    last = _last_green()
    tail = _PRIORITY[DRIVER_WINDOW:]
    for q in tail:
        assert last.get(q) == 4, f"queued {q} expected r4-stale, last green r{last.get(q)}"
    window = set(_PRIORITY[:DRIVER_WINDOW])
    all_r4 = {q for q, r in last.items() if r == 4 and q in QUERIES}
    assert all_r4 - window == set(tail)
