"""Protocol-logic tests for scaling_bench.measure_pair (stubbed
run_level — no Spark): early-exit discipline, attempt accounting,
triple-divergence refusal, and partial-log-on-failure."""

import pytest

import scaling_bench as sb


@pytest.fixture
def quiet(monkeypatch):
    monkeypatch.setattr(sb, "wait_for_idle", lambda *a, **k: 0.5)
    logged = {"full": [], "partial": []}
    monkeypatch.setattr(sb, "_append_log", lambda n, s: logged["full"].append(s))
    monkeypatch.setattr(sb, "_append_partial_log",
                        lambda n, nd, legs: logged["partial"].append(legs))
    return logged


def test_early_exit_needs_min_attempts(monkeypatch, quiet):
    calls = []

    def fake_run(cores, n_docs):
        calls.append(cores)
        sec = {8: 40.0, 2: 135.0}[cores] + 0.1 * len(calls)
        return {"cores": cores, "sec": sec,
                "docs_per_sec": round(n_docs / sec, 1), "triples": 100}

    monkeypatch.setattr(sb, "run_level", fake_run)
    s = sb.measure_pair(2, 1000, attempts=3, min_attempts=2)
    # gate passes on attempt 1, but the keep-bias guard forces a second
    # symmetric sample of each leg before the loop may stop
    assert len(s["attempts"]["lo"]) == 2 and len(s["attempts"]["hi"]) == 2
    assert s["efficiency"] >= 0.8 and s["triples_consistent"] is True
    assert quiet["full"], "passing pair must be logged"


def test_divergent_triples_refuse_to_certify(monkeypatch, quiet):
    def bad_run(cores, n_docs):
        return {"cores": cores, "sec": 10.0 if cores == 8 else 33.0,
                "docs_per_sec": 1.0, "triples": cores}   # differs per leg

    monkeypatch.setattr(sb, "run_level", bad_run)
    with pytest.raises(ValueError, match="diverged"):
        sb.measure_pair(2, 1000, attempts=1)
    assert quiet["partial"], "refused pair must still log its attempts"


def test_bad_attempts_and_partial_log_on_crash(monkeypatch, quiet):
    with pytest.raises(ValueError, match="attempts"):
        sb.measure_pair(2, 1000, attempts=0)

    seen = []

    def dying_run(cores, n_docs):
        if len(seen) == 1:
            raise RuntimeError("leg died")
        rec = {"cores": cores, "sec": 10.0, "docs_per_sec": 1.0, "triples": 7}
        seen.append(rec)
        return rec

    monkeypatch.setattr(sb, "run_level", dying_run)
    with pytest.raises(RuntimeError, match="leg died"):
        sb.measure_pair(2, 1000, attempts=2)
    # the completed first leg reached the log before the crash surfaced
    assert quiet["partial"] and quiet["partial"][-1]["hi"]


def test_budget_stops_after_complete_pair(monkeypatch, quiet):
    """budget_s outranks min_attempts: with one complete pair on
    record and the budget spent, no further leg starts — the caller's
    harness timeout must never kill the protocol mid-run."""
    clock = {"t": 0.0}
    monkeypatch.setattr(sb.time, "monotonic", lambda: clock["t"])

    def slow_run(cores, n_docs):
        clock["t"] += 100.0                      # each leg burns budget
        return {"cores": cores, "sec": 50.0 if cores == 8 else 120.0,
                "docs_per_sec": 1.0, "triples": 9}

    monkeypatch.setattr(sb, "run_level", slow_run)
    s = sb.measure_pair(2, 1000, attempts=3, min_attempts=3, budget_s=150.0)
    # pair 1 (two legs, 200 "seconds") exceeds the budget; attempts 2-3
    # never run despite min_attempts=3 and a failing gate (eff 0.6)
    assert len(s["attempts"]["hi"]) == 1 and len(s["attempts"]["lo"]) == 1
    assert s["efficiency"] == 0.6 and "budget<=150" in s["protocol"]
