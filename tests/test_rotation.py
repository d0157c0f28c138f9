"""Rotation-invariant pin (r8 verdict prescription #4).

The driver records exactly the first 50 entries of queries() each round.
__spark_entry__._ordered_queries() implements the staleness rotation;
the handoff comments claim a window distribution and a staleness bound.
Those claims were previously hand-computed — this test derives them from
the _R0*_RECORDED sets + the modified block + registration order and
fails if the ordering code and the handoff comment diverge.

No SparkSession needed: ordering only imports the catalog registry.
"""

from collections import Counter

import __spark_entry__ as entry

CURRENT_ROUND = 14
WINDOW = 50
# Steady-state bar from the r7/r8 verdicts: after this round's window is
# recorded, no query's latest driver record may be more than 3 rounds
# old (>= CURRENT_ROUND - 3).
MAX_STALENESS_ROUNDS = 3


def _record_sets():
    """(round, frozenset) pairs, newest first, discovered from the module
    so adding _R10_RECORDED next round is picked up automatically."""
    sets = []
    for rnd in range(CURRENT_ROUND - 1, 0, -1):
        name = f"_R{rnd:02d}_RECORDED"
        if hasattr(entry, name):
            sets.append((rnd, getattr(entry, name)))
    return sets


def _last_recorded(name, sets):
    for rnd, recorded in sets:
        if name in recorded:
            return rnd
    return None


def test_window_is_exactly_50_and_names_are_registered():
    ordered = [n for n, _ in entry._ordered_queries()]
    assert len(ordered) == len(set(ordered)), "duplicate query names"
    assert len(ordered) >= WINDOW
    import uc_historic_data_importer_spark.plans.catalog_ext  # noqa: F401
    import uc_historic_data_importer_spark.plans.catalog_classic  # noqa: F401
    from uc_historic_data_importer_spark.plans.catalog import QUERIES

    assert set(ordered) == set(QUERIES)


def test_slipped_and_modified_blocks_resolve_to_real_queries():
    import uc_historic_data_importer_spark.plans.catalog_ext  # noqa: F401
    import uc_historic_data_importer_spark.plans.catalog_classic  # noqa: F401
    from uc_historic_data_importer_spark.plans.catalog import QUERIES

    for name in entry._R14_SLIPPED_R10:
        assert name in QUERIES, f"slipped-block name not in catalog: {name}"
    for name in entry._R14_MODIFIED_SINCE_RECORD:
        assert name in QUERIES, f"modified-block name not in catalog: {name}"


def test_slipped_r10_queries_sort_first():
    """The r13 verdict pins the 26 slipped r10-latest queries to the very
    front of the round-14 window."""
    ordered = [n for n, _ in entry._ordered_queries()]
    assert tuple(ordered[: len(entry._R14_SLIPPED_R10)]) == entry._R14_SLIPPED_R10


def test_slipped_block_is_exactly_the_r10_latest_stragglers():
    """Every slipped entry's latest record is r10, and every query whose
    latest record is r10 is in the slipped block (nothing older exists)."""
    sets = _record_sets()
    ordered = [n for n, _ in entry._ordered_queries()]
    r10_latest = {n for n in ordered if _last_recorded(n, sets) == 10}
    older = {
        n
        for n in ordered
        if (_last_recorded(n, sets) or CURRENT_ROUND) < 10
    }
    assert older == set(), f"queries with latest record older than r10: {older}"
    assert r10_latest == set(entry._R14_SLIPPED_R10)


def test_modified_block_lands_inside_the_window():
    """Re-record doctrine: a query whose call path changed this round
    must re-record this round — i.e. appear inside the first 50."""
    ordered = [n for n, _ in entry._ordered_queries()]
    window = set(ordered[:WINDOW])
    missing = [n for n in entry._R14_MODIFIED_SINCE_RECORD if n not in window]
    assert missing == [], (
        f"modified-since-record queries pushed past the window: {missing}"
    )


def test_never_recorded_queries_land_inside_the_window():
    sets = _record_sets()
    ordered = [n for n, _ in entry._ordered_queries()]
    window = set(ordered[:WINDOW])
    fresh = [n for n in ordered if _last_recorded(n, sets) is None]
    assert all(n in window for n in fresh), (
        f"never-recorded queries outside window: "
        f"{[n for n in fresh if n not in window]}"
    )


def test_post_round_staleness_bound():
    """After this round's window is recorded, every query's latest
    record is within MAX_STALENESS_ROUNDS of CURRENT_ROUND."""
    sets = _record_sets()
    ordered = [n for n, _ in entry._ordered_queries()]
    window = set(ordered[:WINDOW])
    floor = CURRENT_ROUND - MAX_STALENESS_ROUNDS
    violations = {}
    for n in ordered:
        latest = CURRENT_ROUND if n in window else _last_recorded(n, sets)
        assert latest is not None, f"query would never be recorded: {n}"
        if latest < floor:
            violations[n] = latest
    assert violations == {}, (
        f"queries whose latest record would predate r{floor:02d}: {violations}"
    )


# The handoff comment's claimed window distribution (update BOTH when
# the modified block changes — the test exists to catch exactly the
# divergence between ordering code and handoff comment).
CLAIMED_DISTRIBUTION = {10: 26, 11: 18, 12: 4, 13: 2}


def test_handoff_comment_distribution():
    """The handoff comment's claimed latest-record distribution of the
    round-14 window, derived instead of hand-computed."""
    sets = _record_sets()
    ordered = [n for n, _ in entry._ordered_queries()]
    dist = Counter(_last_recorded(n, sets) for n in ordered[:WINDOW])
    assert dict(dist) == CLAIMED_DISTRIBUTION
    assert sum(dist.values()) == WINDOW
    # Nothing in the window should be r09-or-older (those were all
    # cleared by r12/r13) and nothing OUTSIDE the window may be r10.
    assert all(k is None or k >= 10 for k in dist)
    outside = [
        n for n in ordered[WINDOW:] if _last_recorded(n, sets) == 10
    ]
    assert outside == []


def test_soak_tool_state_metrics_shape():
    """tools/soak_stream_state.py's metric extraction: one row per
    (progress, state operator), tolerating absent/None stateOperators —
    the shape BENCH_sf1_r09's streaming_state_soak evidence relies on."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "soak_stream_state",
        os.path.join(os.path.dirname(__file__), "..", "tools",
                     "soak_stream_state.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    class FakeQ:
        recentProgress = [
            {"batchId": 0, "stateOperators": [
                {"operatorName": "sessionWindow", "numRowsTotal": 10,
                 "numRowsUpdated": 10, "numRowsRemoved": 0,
                 "numRowsDroppedByWatermark": 0}]},
            {"batchId": 1, "stateOperators": None},
            {"batchId": 2},
            {"batchId": 3, "stateOperators": [
                {"operatorName": "sessionWindow", "numRowsTotal": 2,
                 "numRowsUpdated": 1, "numRowsRemoved": 9,
                 "numRowsDroppedByWatermark": 4}]},
        ]

    rows = mod.state_metrics(FakeQ())
    assert [r["batch"] for r in rows] == [0, 3]
    assert rows[1]["rows_removed"] == 9
    assert rows[1]["dropped_by_watermark"] == 4


def test_bench_calibration_skips_when_sf01_absent():
    """ADVICE r12: a box without /root/testdata/sf0.1 must still emit
    the headline bench record — run_calibration returns {} instead of
    crashing on the hardcoded path (the caller then omits the
    calibration/normalized fields)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_mod",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench.run_calibration({}, None, "/nonexistent/sf0.1") == {}
