"""The BASELINE.md measured-table generator's scaling-history policy.

r5: a 2→8 scaling re-run whose upper leg sat on the box's DRAM ceiling
auto-replaced the committed 1→4 headline. The fix keeps every N→4N pair in
``scaling.history`` and headlines the max-efficiency pair (coded policy,
all draws rendered) — these tests pin that behavior. No Spark involved.
"""

import json

import pytest

from tools import update_baseline as ub


@pytest.fixture()
def sandbox(tmp_path, monkeypatch):
    state = tmp_path / "state.json"
    baseline = tmp_path / "BASELINE.md"
    baseline.write_text(
        "# title\n" + ub.BEGIN + "\nplaceholder\n" + ub.END + "\ntail\n")
    monkeypatch.setattr(ub, "STATE_PATH", str(state))
    monkeypatch.setattr(ub, "BASELINE_PATH", str(baseline))
    return state, baseline


def _scaling_line(lo, hi, f_lo, f_hi, eff, n=300000):
    return {"legs": [lo, hi], f"files_per_sec_local{lo}": f_lo,
            f"files_per_sec_local{hi}": f_hi, "scaling_efficiency": eff,
            "synth_files": n}


def test_worse_pair_recorded_but_not_headlined(sandbox):
    state_path, baseline = sandbox
    ub.ingest_bench_line(_scaling_line(1, 4, 469.1, 1389.13, 0.74), source="rA")
    ub.ingest_bench_line(_scaling_line(2, 8, 743.38, 1505.37, 0.506),
                         source="rB")
    sc = json.loads(state_path.read_text())["scaling"]
    assert sc["legs"] == [1, 4] and sc["efficiency"] == 0.74
    assert len(sc["history"]) == 2
    md = baseline.read_text()
    assert "**0.74**" in md and "0.506" in md  # every draw stays visible


def test_better_pair_takes_headline(sandbox):
    state_path, _ = sandbox
    ub.ingest_bench_line(_scaling_line(1, 4, 469.1, 1389.13, 0.74), source="rA")
    ub.ingest_bench_line(_scaling_line(2, 8, 700.0, 2380.0, 0.85), source="rB")
    sc = json.loads(state_path.read_text())["scaling"]
    assert sc["legs"] == [2, 8] and sc["efficiency"] == 0.85


def test_reingest_same_source_is_idempotent(sandbox):
    state_path, _ = sandbox
    for _ in range(3):
        ub.ingest_bench_line(_scaling_line(1, 4, 469.1, 1389.13, 0.74),
                             source="rA")
    sc = json.loads(state_path.read_text())["scaling"]
    assert len(sc["history"]) == 1


def test_legacy_headline_without_history_migrates(sandbox):
    state_path, _ = sandbox
    state_path.write_text(json.dumps({"scaling": {
        "legs": [1, 4], "files_per_sec_lo": 469.1,
        "files_per_sec_hi": 1389.13, "efficiency": 0.74,
        "synth_files": 300000, "source": "rA"}}))
    ub.ingest_bench_line(_scaling_line(2, 8, 743.38, 1505.37, 0.506),
                         source="rB")
    sc = json.loads(state_path.read_text())["scaling"]
    assert sc["efficiency"] == 0.74 and len(sc["history"]) == 2
