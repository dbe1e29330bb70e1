"""Unit tests for bench.py's regression-gate helpers (no Spark)."""

from __future__ import annotations

import json

import bench


def test_prior_round_timings_invariants():
    """Time-invariant live-repo check (VERDICT r06 item 1): whatever round
    the driver has reached, the selected baseline must (a) exist, (b) not
    be a crashed round, (c) carry positive float timings keyed by known
    query names. No assertion here names the *current* round's artifact,
    so driver writes can never break this test."""
    name, prior = bench._prior_round_timings()
    assert name is not None and prior, "prior timings should be found"
    assert name != "BENCH_r03.json", "r03 crashed (rc=1) and must be skipped"
    assert all(isinstance(v, (int, float)) and v > 0 for v in prior.values())
    assert all(n in bench.HEADLINE for n in prior)


def test_timings_from_frozen_r05_truncated_tail():
    """VERDICT r05 item 3, pinned against the FROZEN historical artifact:
    BENCH_r05.json has parsed=null and a head-truncated 2,000-char tail;
    the pair-scrape recovers the visible suffix. The file never changes
    again, so these assertions can never rot (VERDICT r06 item 1)."""
    import os

    path = os.path.join(os.path.dirname(bench.__file__), "BENCH_r05.json")
    prior = bench._timings_from_file(path)
    # visible in the truncated tail
    assert prior.get("m39_containment_pairs") == 4.091
    assert prior.get("m42_curation_v2") == 4.902
    # wrapper fields and regression sub-keys must not masquerade as queries
    assert "prior" not in prior and "sf" not in prior and "value" not in prior
    assert all(n in bench.HEADLINE for n in prior)


def test_round_transition_prefers_newest_local(tmp_path, monkeypatch):
    """Selection logic under a driver round-advance, on synthetic
    artifacts only: when the driver writes BENCH_r{N}.json the current
    round ticks to N+1 and the committed BENCH_LOCAL_r{N}.json becomes the
    baseline — the exact r05→r06→r07 transition that broke three rounds of
    hardcoded-name tests."""
    (tmp_path / "BENCH_r05.json").write_text(
        json.dumps({"n": 5, "rc": 0, "tail": '… "q1": 4.0}'})
    )
    (tmp_path / "BENCH_r06.json").write_text(
        json.dumps({"n": 6, "rc": 0, "tail": "truncated, no metric line"})
    )
    (tmp_path / "BENCH_LOCAL_r06.json").write_text(
        json.dumps({"metric": "headline_wall_clock", "queries": {"q1": 2.0},
                    "methodology": 2})
    )
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    assert bench._current_round() == 7
    name, prior = bench._prior_round_timings()
    assert name == "BENCH_LOCAL_r06.json" and prior == {"q1": 2.0}
    # the driver then writes round-7 artifacts: the baseline advances to
    # the newest round with timings, and nothing crashes
    (tmp_path / "BENCH_r07.json").write_text(
        json.dumps({"n": 7, "rc": 0,
                    "tail": json.dumps({"metric": "headline_wall_clock",
                                        "queries": {"q1": 1.5}})})
    )
    assert bench._current_round() == 8
    name, prior = bench._prior_round_timings()
    assert name == "BENCH_r07.json" and prior == {"q1": 1.5}


def test_prior_round_timings_prefers_local_file(tmp_path, monkeypatch):
    """A full BENCH_LOCAL_r{N}.json written by bench.py beats the driver's
    truncated wrapper for the same round, and the current round's own
    LOCAL file is never used as its baseline."""
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"n": 1, "rc": 0, "tail": "truncated, no metric line"})
    )
    (tmp_path / "BENCH_LOCAL_r01.json").write_text(
        json.dumps({"metric": "headline_wall_clock", "queries": {"q1": 1.25}})
    )
    # current round (r02) already ran bench once locally: must NOT baseline
    # on itself
    (tmp_path / "BENCH_LOCAL_r02.json").write_text(
        json.dumps({"metric": "headline_wall_clock", "queries": {"q1": 9.9}})
    )
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    assert bench._current_round() == 2
    name, prior = bench._prior_round_timings()
    assert name == "BENCH_LOCAL_r01.json" and prior == {"q1": 1.25}


def test_prior_round_timings_tolerates_malformed_documents(tmp_path, monkeypatch):
    """Non-object JSON (array/string), object with non-dict queries, and
    non-string tail are all skipped, not crashed on (ADVICE r04)."""
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"metric": "x", "queries": {"q1": 1.0}})
    )
    (tmp_path / "BENCH_r02.json").write_text(json.dumps([1, 2, 3]))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({"queries": "oops"}))
    (tmp_path / "BENCH_r04.json").write_text(json.dumps({"tail": 42}))
    monkeypatch.setattr(bench.os.path, "dirname", lambda _p: str(tmp_path))
    name, prior = bench._prior_round_timings()
    assert name == "BENCH_r01.json" and prior == {"q1": 1.0}


def test_prior_round_timings_parses_driver_wrapper(tmp_path, monkeypatch):
    """Both file shapes parse: raw metric line and driver {n, rc, tail}."""
    line = {"metric": "headline_wall_clock", "value": 2.0,
            "queries": {"q1": 1.0, "q2": 1.0}}
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(line))
    (tmp_path / "BENCH_r02.json").write_text(
        json.dumps({"n": 2, "rc": 0, "tail": "noise\n" + json.dumps(
            {"metric": "headline_wall_clock", "value": 3.0,
             "queries": {"q1": 1.5, "q2": 1.5}})})
    )
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"n": 3, "rc": 1, "tail": "Traceback: boom"})
    )
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _p: str(tmp_path)
    )
    name, prior = bench._prior_round_timings()
    assert name == "BENCH_r02.json" and prior == {"q1": 1.5, "q2": 1.5}


def test_methodology_detection(tmp_path, monkeypatch):
    """Pre-round-6 artifacts (no methodology key) read as v1; current
    LOCAL files carry the METHODOLOGY constant."""
    (tmp_path / "BENCH_r01.json").write_text(
        json.dumps({"queries": {"q1": 1.0}})
    )
    (tmp_path / "BENCH_LOCAL_r01.json").write_text(
        json.dumps({"queries": {"q1": 1.0}, "methodology": 2})
    )
    assert bench._file_methodology(str(tmp_path / "BENCH_r01.json")) == 1
    assert bench._file_methodology(str(tmp_path / "BENCH_LOCAL_r01.json")) == 2
    assert bench._file_methodology(str(tmp_path / "missing.json")) == 1
