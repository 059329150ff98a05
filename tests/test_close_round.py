"""tools/close_round.py is now the source of every closing-ledger
claim — test the artifact-derivation logic itself (no Spark needed):
last-green aggregation, window provenance, fingerprint diffing, and
the normalizer-drift rule on synthetic artifact trees."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

SPEC = importlib.util.spec_from_file_location(
    "close_round",
    os.path.join(os.path.dirname(__file__), "..", "tools", "close_round.py"),
)
close_round = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(close_round)


def _write_rounds(tmp_path, rounds: dict[int, dict]):
    for r, entries in rounds.items():
        with open(tmp_path / f"CORRECTNESS_r{r:02d}.json", "w") as f:
            json.dump(entries, f)


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
ROWS_ONLY = {"rows_match": True, "schema_match": True, "hash_match": None, "err": None}
RED = {"rows_match": False, "schema_match": True, "hash_match": False, "err": "boom"}


def test_last_green_rounds(tmp_path, monkeypatch):
    _write_rounds(
        tmp_path,
        {
            1: {"a": GREEN, "b": GREEN},
            2: {"a": RED, "c": GREEN},
            3: {"b": GREEN, "c": ROWS_ONLY},
        },
    )
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    got = close_round.last_green_rounds(3)
    # a's r2 row is red -> its last GREEN stays r1; rows-only counts
    assert got == {"a": 1, "b": 3, "c": 3}


def test_last_green_ignores_future_rounds(tmp_path, monkeypatch):
    _write_rounds(tmp_path, {1: {"a": GREEN}, 2: {"a": GREEN}})
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    assert close_round.last_green_rounds(1) == {"a": 1}


def test_fingerprint_diff_movers(tmp_path, monkeypatch):
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    with open(tmp_path / "PLANS_r10.json", "w") as f:
        json.dump({"q1": "aaaa", "q2": "bbbb", "gone": "x"}, f)
    with open(tmp_path / "PLANS_r11.json", "w") as f:
        json.dump({"q1": "aaaa", "q2": "MOVED", "new": "y"}, f)
    monkeypatch.setattr(
        close_round,
        "normalizer_drift",
        lambda prev: {"comparable": True, "rebased_baseline_exists": False},
    )
    d = close_round.fingerprint_diff(11)
    assert d["movers"] == ["q2"]
    assert d["added"] == ["new"] and d["removed"] == ["gone"]
    assert d["unchanged"] == 1


def test_fingerprint_diff_prefers_rebased_baseline(tmp_path, monkeypatch):
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    with open(tmp_path / "PLANS_r10.json", "w") as f:
        json.dump({"q1": "old-normalizer"}, f)
    with open(tmp_path / "PLANS_r10_rebased.json", "w") as f:
        json.dump({"q1": "cccc"}, f)
    with open(tmp_path / "PLANS_r11.json", "w") as f:
        json.dump({"q1": "cccc"}, f)
    monkeypatch.setattr(
        close_round,
        "normalizer_drift",
        lambda prev: {"comparable": True, "rebased_baseline_exists": True},
    )
    d = close_round.fingerprint_diff(11)
    assert d["baseline_file"] == "PLANS_r10_rebased.json"
    assert d["movers"] == [] and d["unchanged"] == 1


def test_registry_and_window_against_live_entry():
    reg, win = close_round.registry_and_window()
    assert len(win) == 50 and len(set(win)) == 50
    assert win == reg[:50]
    assert len(reg) >= 170


def test_parse_pytest_summary(monkeypatch):
    class FakeProc:
        stdout = "....\n939 passed, 399 warnings in 1492.63s (0:24:52)\n"

    monkeypatch.setattr(
        close_round.subprocess, "run", lambda *a, **k: FakeProc()
    )
    got = close_round.run_pytest()
    assert got["passed"] == 939 and got["failed"] == 0


def test_parse_replica_summary(monkeypatch):
    class FakeProc:
        stdout = "OK x (1 rows)\n\n170 ok, 0 failed, 0 rows-only\n"

    monkeypatch.setattr(
        close_round.subprocess, "run", lambda *a, **k: FakeProc()
    )
    got = close_round.run_replica()
    assert got == {
        "summary": "170 ok, 0 failed, 0 rows-only",
        "ok": 170,
        "failed": 0,
        "rows_only": 0,
    }


def test_recommended_window_rule():
    registry = ["new1", "chg1", "old_r1", "old_r2a", "old_r2b", "fresh"]
    green = {"chg1": 5, "old_r1": 1, "old_r2a": 2, "old_r2b": 2, "fresh": 9}
    rec = close_round.recommended_window(
        registry, green, changed={"chg1"}, size=4
    )
    # new first, changed second, then oldest-first alphabetical
    assert rec == ["new1", "chg1", "old_r1", "old_r2a"]


def test_window_check_diffs():
    registry = ["a", "b", "c", "d"]
    green = {"b": 1, "c": 2, "d": 3}
    chk = close_round.window_check(
        registry, ["a", "d"], green, changed=set()
    )
    # rule wants [a (new), b (oldest)]: d is unexpected, b missing
    assert not chk["matches_rule"]
    assert chk["missing_from_window"] == ["b"]
    assert chk["unexpected_in_window"] == ["d"]


def test_live_window_matches_rule():
    """The committed r11 window satisfies the composition rule."""
    changed = {
        "semdedup", "embedding_near_dup", "near_dup_multiblock",
        "dedupe_near", "dedupe_near_best", "minhash_lsh_pairs",
        "near_dup_clusters",
    }
    green = close_round.last_green_rounds(10)
    registry, window = close_round.registry_and_window()
    chk = close_round.window_check(registry, window, green, changed)
    assert chk["matches_rule"], chk
