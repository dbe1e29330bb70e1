"""Unit tests for bench.py's regression-gate helpers (no Spark)."""

from __future__ import annotations

import json

import bench


def test_prior_round_timings_skips_crashed_rounds():
    """The newest BENCH file with per-query timings wins; crashed rounds
    (driver wrapper with rc=1 and no metric line) are skipped."""
    name, prior = bench._prior_round_timings()
    assert name is not None and prior, "prior timings should be found"
    assert name != "BENCH_r03.json", "r03 crashed (rc=1) and must be skipped"
    assert all(isinstance(v, (int, float)) and v > 0 for v in prior.values())


def test_prior_round_timings_recovers_r05_from_truncated_tail():
    """VERDICT r05 item 3: BENCH_r05.json has parsed=null and a
    head-truncated 2,000-char tail; the pair-scrape recovers the visible
    suffix so r06 baselines on r05-era timings, not r04's."""
    name, prior = bench._prior_round_timings()
    assert name == "BENCH_r05.json"
    # visible in the truncated tail
    assert prior.get("m39_containment_pairs") == 4.091
    assert prior.get("m42_curation_v2") == 4.902
    # wrapper fields and regression sub-keys must not masquerade as queries
    assert "prior" not in prior and "sf" not in prior and "value" not in prior
    assert all(n in bench.HEADLINE for n in prior)


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
