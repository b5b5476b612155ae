"""The self-defending bench artifact: rows inflated vs the prior round
carry a mechanical suspect_interference annotation (no Spark needed —
pure comparison logic against a committed BENCH_r{N}.json)."""

import json

from bench import _suspect_interference


def _write_prior(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_flags_only_rows_over_2x_prior_median(tmp_path):
    _write_prior(
        tmp_path,
        "BENCH_r03.json",
        {
            "queries": {"q01": 1.0, "q02": 2.0, "q03": 3.0},
            "bands": {
                "q01": {"best": 1.0, "median": 1.2},
                "q02": {"best": 2.0, "median": 2.2},
                "q03": {"best": 3.0, "median": 3.3},
            },
        },
    )
    out = _suspect_interference({"q01": 5.0, "q02": 2.1, "q03": 3.0}, str(tmp_path))
    assert set(out) == {"q01"}
    row = out["q01"]
    assert row["prior_round"] == "BENCH_r03.json"
    # stable consumer key + statistic label (r10 advice), legacy key kept
    assert row["prior_value"] == 1.2
    assert row["prior_stat"] == "median"
    assert row["prior_median"] == 1.2
    assert row["ratio"] == round(5.0 / 1.2, 2)
    # battery context: q02/q03 held ~1x, so the median ratio is ~1
    assert row["battery_median_ratio"] < 1.1


def test_latest_round_wins_and_driver_wrapper_parsed(tmp_path):
    """The driver wraps bench stdout under 'tail' (possibly truncated,
    'parsed': null) — bands must still be recovered; and r10 beats r9."""
    _write_prior(tmp_path, "BENCH_r09.json", {"queries": {"q01": 50.0}})
    tail = '...(truncated), "q01": {"best": 1.0, "median": 1.5}, "q02": {"best": 2.0, "median": 2.0}}'
    _write_prior(tmp_path, "BENCH_r10.json", {"n": 8, "rc": 0, "tail": tail, "parsed": None})
    out = _suspect_interference({"q01": 4.0, "q02": 2.0}, str(tmp_path))
    assert set(out) == {"q01"}
    assert out["q01"]["prior_round"] == "BENCH_r10.json"
    assert out["q01"]["prior_value"] == 1.5
    assert out["q01"]["prior_stat"] == "median"
    assert out["q01"]["prior_median"] == 1.5


def test_bandless_legacy_prior_labeled_best(tmp_path):
    """A legacy artifact without bands only has best-of-N — the stable
    'prior_value' key must still be present, labeled 'best'."""
    _write_prior(tmp_path, "BENCH_r02.json", {"queries": {"q01": 1.0}})
    out = _suspect_interference({"q01": 5.0}, str(tmp_path))
    assert out["q01"]["prior_value"] == 1.0
    assert out["q01"]["prior_stat"] == "best"
    assert out["q01"]["prior_best"] == 1.0


def test_failed_and_unknown_rows_skipped(tmp_path):
    _write_prior(
        tmp_path,
        "BENCH_r01.json",
        {"queries": {"q01": -1.0}, "bands": {"q01": {"best": -1.0, "median": -1.0}}},
    )
    # prior row failed (-1) and q_new has no prior — neither can be flagged
    assert _suspect_interference({"q01": 9.0, "q_new": 9.0}, str(tmp_path)) == {}


def test_no_prior_artifact_is_silent(tmp_path):
    assert _suspect_interference({"q01": 9.0}, str(tmp_path)) == {}


def test_non_round_artifacts_ignored(tmp_path):
    """BENCH_r09_local.json (the committed settled-machine battery) and
    other non-driver artifacts matching the glob must not be treated as
    the prior round."""
    _write_prior(tmp_path, "BENCH_r05.json",
                 {"queries": {"q01": 1.0}, "bands": {"q01": {"best": 1.0, "median": 1.0}}})
    _write_prior(tmp_path, "BENCH_r09_local.json",
                 {"queries": {"q01": 100.0}, "bands": {"q01": {"best": 100.0, "median": 100.0}}})
    out = _suspect_interference({"q01": 5.0}, str(tmp_path))
    # compared against r05 (median 1.0), not the local artifact (100.0)
    assert out["q01"]["prior_round"] == "BENCH_r05.json"
