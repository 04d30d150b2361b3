"""Matrix-runner resilience logic (scripts/run_matrix.py): start-attempt
accounting, crash/hang markers, probed row budgets. Round 3 lost ~2h to a
backend crash loop and an evening to a hang because none of this existed —
these tests are pure-python (run_cell monkeypatched) and run in ms."""
import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.run_matrix as rm


@pytest.fixture()
def sandbox(tmp_path, monkeypatch):
    raw = tmp_path / "raw"
    raw.mkdir()
    monkeypatch.setattr(rm, "RESULTS_DIR", str(raw))
    monkeypatch.setattr(rm, "CKPT_DIR", str(tmp_path / "ckpt"))
    monkeypatch.setattr(rm, "PROBE_PATH", str(tmp_path / "probe.json"))
    monkeypatch.setattr(
        sys, "argv",
        ["run_matrix.py", "--families", "cartpole", "--models", "vanilla",
         "--seeds", "0"],
    )
    return raw


def _cell(raw, ext):
    return raw / f"cartpole__vanilla__s0{ext}"


def test_success_clears_attempts(sandbox, monkeypatch):
    monkeypatch.setattr(
        rm, "run_cell",
        lambda f, m, s: ({"family": f, "model": m, "seed": s,
                          "wall_clock_s": 1.0,
                          "history": [{"eval/return_mode0": 1.0,
                                       "eval/return_mode1": 1.0,
                                       "eval/return_mode2": 1.0}]}, {"w": 1}),
    )
    monkeypatch.setattr(rm, "save_snapshot", lambda name, st: None)
    rm.main()
    assert _cell(sandbox, ".json").exists()
    assert not _cell(sandbox, ".attempts").exists()


def test_backend_crash_exits_17_and_counts_attempt(sandbox, monkeypatch):
    def boom(f, m, s):
        raise RuntimeError("UNAVAILABLE: TPU worker process crashed")

    monkeypatch.setattr(rm, "run_cell", boom)
    with pytest.raises(SystemExit) as e:
        rm.main()
    assert e.value.code == 17
    assert _cell(sandbox, ".attempts").read_text() == "1"
    assert not _cell(sandbox, ".crashed").exists()


def test_three_starts_without_finish_marks_crashed(sandbox, monkeypatch):
    def boom(f, m, s):
        raise RuntimeError("UNAVAILABLE: TPU worker process crashed")

    monkeypatch.setattr(rm, "run_cell", boom)
    for expected in ("1", "2", "3"):
        with pytest.raises(SystemExit):
            rm.main()
        assert _cell(sandbox, ".attempts").read_text() == expected
    # 4th pass: sees 3 prior starts, marks .crashed, SKIPS the cell (no
    # SystemExit — run_cell is never called again)
    calls = []
    monkeypatch.setattr(
        rm, "run_cell", lambda *a: calls.append(a) or (_ for _ in ()).throw(
            AssertionError("must not run")
        )
    )
    rm.main()
    assert _cell(sandbox, ".crashed").exists()
    assert not _cell(sandbox, ".attempts").exists()
    assert calls == []
    # and every later pass keeps skipping
    rm.main()
    assert calls == []


def test_hang_kill_counts_like_crash(sandbox, monkeypatch):
    """A timeout-kill leaves no exception — just a stale .attempts file.
    Three such starts must also converge to .crashed."""
    for _ in range(3):
        # simulate: main() writes attempts then the process dies mid-cell
        def hang(f, m, s):
            raise KeyboardInterrupt  # stand-in for SIGKILL mid-run

        monkeypatch.setattr(rm, "run_cell", hang)
        with pytest.raises(KeyboardInterrupt):
            rm.main()
    rm.main()  # 4th: marks .crashed, skips
    assert _cell(sandbox, ".crashed").exists()


def test_python_failure_writes_failed_marker_and_clears_attempts(
    sandbox, monkeypatch
):
    def bad(f, m, s):
        raise ValueError("shape mismatch")

    monkeypatch.setattr(rm, "run_cell", bad)
    rm.main()  # no SystemExit: ordinary failures continue the sweep
    assert _cell(sandbox, ".failed").exists()
    assert not _cell(sandbox, ".attempts").exists()
    # later passes skip the failed cell
    calls = []
    monkeypatch.setattr(rm, "run_cell", lambda *a: calls.append(a))
    rm.main()
    assert calls == []


def test_sigterm_restores_attempt_counter(sandbox, monkeypatch):
    """An external SIGTERM reaching a RESPONSIVE interpreter (matrix_loop
    timeout on a healthy-but-slow cell, round-end cut) must not charge the
    in-flight cell a start attempt — only true backend hangs (where the
    signal never gets delivered) should burn the 3-strikes budget."""
    ap = _cell(sandbox, ".attempts")

    def dies_by_sigterm(f, m, s):
        rm._on_sigterm(None, None)

    monkeypatch.setattr(rm, "run_cell", dies_by_sigterm)
    with pytest.raises(SystemExit) as e:
        rm.main()
    assert e.value.code == 143
    # first start: pre-start count was 0 -> file removed entirely
    assert not ap.exists()

    # second scenario: one real (hang) attempt already recorded
    ap.write_text("1")
    with pytest.raises(SystemExit):
        rm.main()
    assert ap.read_text() == "1"  # restored to the pre-start count


def test_probed_budget_applies_min(sandbox, monkeypatch, tmp_path):
    with open(rm.PROBE_PATH, "w") as f:
        json.dump({"slim_humanoid:pets_cadm": {"max_safe_rows": 12345}}, f)
    assert rm.probed_budget("slim_humanoid", "pets_cadm") == 12345
    assert rm.probed_budget("hopper", "pets_cadm") is None
    # zero/absent safe rows -> no override
    with open(rm.PROBE_PATH, "w") as f:
        json.dump({"slim_humanoid:pets_cadm": {"max_safe_rows": 0}}, f)
    assert rm.probed_budget("slim_humanoid", "pets_cadm") is None


def test_probed_budget_ensemble_fallback(sandbox, monkeypatch, tmp_path):
    """Ensemble variants inherit the family's pets_cadm probe: the fault is
    the chunked TS1 planner path at the family's row count, not the loss or
    head knobs (r5i: slim pets_cadm_dv crashed twice on the 32768 path the
    pets_cadm probe had bisected as faulting)."""
    with open(rm.PROBE_PATH, "w") as f:
        json.dump({"slim_humanoid:pets_cadm": {"max_safe_rows": 66560}}, f)
    for variant in ("pets_cadm_dv", "pets_cadm_aug", "pets_cadm_mse",
                    "pets", "pets_dv"):
        assert rm.probed_budget("slim_humanoid", variant) == 66560, variant
    # non-ensemble variants do NOT inherit (their planner path never faults)
    assert rm.probed_budget("slim_humanoid", "cadm") is None
    assert rm.probed_budget("slim_humanoid", "vanilla") is None
    # an exact per-variant probe still wins over the fallback
    with open(rm.PROBE_PATH, "w") as f:
        json.dump({"slim_humanoid:pets_cadm": {"max_safe_rows": 66560},
                   "slim_humanoid:pets_cadm_dv": {"max_safe_rows": 11111}}, f)
    assert rm.probed_budget("slim_humanoid", "pets_cadm_dv") == 11111
