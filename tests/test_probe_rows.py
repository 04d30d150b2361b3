"""Row-fault probe bisect logic (scripts/probe_rows.py), pure python:
run_trial is monkeypatched with a synthetic fault threshold."""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.probe_rows as pr


@pytest.fixture()
def cell(monkeypatch):
    # synthetic cell: 256 envs, 5-member ensemble, 256 candidates
    monkeypatch.setattr(
        pr, "build_cell_kwargs",
        lambda f, m: {"n_envs": 256, "ensemble": 5, "n_candidates": 256},
    )
    monkeypatch.setattr(pr, "wait_for_backend", lambda *a, **k: True)


def _fake_trials(monkeypatch, max_safe_rows):
    calls = []

    def fake(family, model, budget, steps, phase="plan"):
        calls.append(budget)
        return budget <= max_safe_rows

    monkeypatch.setattr(pr, "run_trial", fake)
    return calls


def test_rows_per_env_pads_to_member_multiple(cell):
    assert pr.rows_per_env("f", "m") == 260  # ceil(256/5)*5


def test_bisect_finds_boundary(cell, monkeypatch):
    calls = _fake_trials(monkeypatch, max_safe_rows=130 * 260)
    res = pr.bisect_probe("f", "m", steps=4)
    assert res["boundary_found"] is True
    assert res["max_safe_envs_per_chunk"] <= 130
    assert res["first_failing_envs_per_chunk"] > res["max_safe_envs_per_chunk"]
    # bisect converges within the coarse tolerance (n_envs//32 = 8)
    assert res["first_failing_envs_per_chunk"] - res["max_safe_envs_per_chunk"] <= 8
    assert res["max_safe_rows"] == res["max_safe_envs_per_chunk"] * 260
    assert len(calls) < 12  # log-ish, not linear


def test_full_batch_passing_short_circuits(cell, monkeypatch):
    calls = _fake_trials(monkeypatch, max_safe_rows=10**9)
    res = pr.bisect_probe("f", "m", steps=4)
    assert res["boundary_found"] is False
    assert res["max_safe_envs_per_chunk"] == 256
    assert calls == [256 * 260]


def test_even_small_chunk_failing_flags_program_bug(cell, monkeypatch):
    _fake_trials(monkeypatch, max_safe_rows=0)
    res = pr.bisect_probe("f", "m", steps=4)
    assert res["boundary_found"] is False
    assert res["max_safe_rows"] == 0
    assert "NOT a row-budget problem" in res["note"]
