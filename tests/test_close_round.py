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
    """The committed r14 window satisfies the composition rule, with
    "changed" read as changed SINCE LAST ATTESTATION (an r13 edit whose
    entry the r13 sample skipped is as unattested as fresh code)."""
    changed = {
        # r14 code changes
        "gopher_repetition", "gopher_repetition_exact", "language_id",
        "ngram_lm_score", "nb_classify", "near_dup_multiblock",
        "near_dup_clusters", "near_dup_clusters_contracted",
        "dedupe_near", "dedupe_near_best", "bloom_dedupe_against",
        # r13 code changes never driver-attested since
        "semdedup", "semdedup_auto", "semdedup_split",
        "remove_duplicated_spans", "ngram_jaccard_pairs",
        "ngram_jaccard_capped", "contamination",
    }
    green = close_round.last_green_rounds(13)
    registry, window = close_round.registry_and_window()
    chk = close_round.window_check(registry, window, green, changed)
    assert chk["matches_rule"], chk


def _bench(total, queries, sf):
    return {"metric": "headline_total_wall", "value": total,
            "unit": "sec", "queries": queries, "sf": sf}


def test_bench_block_ratios(tmp_path, monkeypatch):
    """The r11 defect class: a hand-typed scale ratio drifted 3% from
    the committed artifacts.  bench_block must derive every ratio FROM
    the files — totals, r/r over the SHARED query set only, and the
    sf0.1→sf1 scale ratio."""
    with open(tmp_path / "BENCH_LOCAL_r04.json", "w") as f:
        json.dump(_bench(10.0, {"q1": 4.0, "q2": 6.0, "gone": 1.0}, 0.1), f)
    with open(tmp_path / "BENCH_LOCAL_r05.json", "w") as f:
        json.dump(_bench(8.0, {"q1": 2.0, "q2": 6.0, "new": 0.5}, 0.1), f)
    with open(tmp_path / "BENCH_LOCAL_r05_sf1.json", "w") as f:
        json.dump(_bench(16.0, {"q1": 4.0, "q2": 12.0}, 1.0), f)
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    b = close_round.bench_block(5)
    assert b["total_sf01"] == 8.0
    # shared set is {q1, q2}: (2+6)/(4+6), not 8.0/10.0
    assert b["rr_ratio_sf01"] == 0.8
    assert b["rr_shared_queries"] == 2
    # scale ratio over the sf0.1∩sf1 shared set: (4+12)/(2+6)
    assert b["scale_ratio_sf01_to_sf1"] == 2.0
    assert b["rr_best"][0] == {"query": "q1", "ratio": 0.5}
    assert b["rr_worst"][0] == {"query": "q2", "ratio": 1.0}
    assert b["sources"]["prev"] == "BENCH_LOCAL_r04.json"


def test_bench_block_skips_missing_rounds(tmp_path, monkeypatch):
    # r3 has no bench; prev lookup must walk back to r2, and a missing
    # sf1 artifact is REPORTED, never guessed
    with open(tmp_path / "BENCH_LOCAL_r02.json", "w") as f:
        json.dump(_bench(5.0, {"q": 5.0}, 0.1), f)
    with open(tmp_path / "BENCH_LOCAL_r04.json", "w") as f:
        json.dump(_bench(4.0, {"q": 4.0}, 0.1), f)
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    b = close_round.bench_block(4)
    assert b["sources"]["prev"] == "BENCH_LOCAL_r02.json"
    assert b["rr_ratio_sf01"] == 0.8
    assert "not committed" in b["sf1"]


def test_bench_block_no_artifact(tmp_path, monkeypatch):
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    assert "not committed" in close_round.bench_block(9)["error"]


def test_bench_block_box_factor(tmp_path, monkeypatch):
    """VERDICT r12 task 2: the frozen calibration query turns the
    'uniform box factor' prose into ledger numbers — r/r ratios are
    deflated by the probe's own cross-round ratio, and the scale ratio
    is deflated by each suite's box factor.  Only trusted when the
    probe's PLANS fingerprint is unchanged between the rounds."""
    cal = close_round.CALIBRATION_QUERY
    with open(tmp_path / "BENCH_LOCAL_r04.json", "w") as f:
        json.dump(_bench(10.0, {cal: 0.2, "q2": 6.0}, 0.1), f)
    with open(tmp_path / "BENCH_LOCAL_r05.json", "w") as f:
        # probe 0.2 -> 0.1: box ran 2x FASTER; raw r/r (0.1+3)/(0.2+6)=0.5
        json.dump(_bench(8.0, {cal: 0.1, "q2": 3.0}, 0.1), f)
    with open(tmp_path / "BENCH_LOCAL_r04_sf1.json", "w") as f:
        json.dump(_bench(20.0, {cal: 0.4, "q2": 12.0}, 1.0), f)
    with open(tmp_path / "BENCH_LOCAL_r05_sf1.json", "w") as f:
        # sf1 probe unchanged (box factor 1.0)
        json.dump(_bench(16.0, {cal: 0.4, "q2": 12.4}, 1.0), f)
    with open(tmp_path / "PLANS_r04.json", "w") as f:
        json.dump({cal: "abc123", "q2": "fff"}, f)
    with open(tmp_path / "PLANS_r05.json", "w") as f:
        json.dump({cal: "abc123", "q2": "eee"}, f)
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    b = close_round.bench_block(5)
    assert b["calibration_query"] == cal
    assert b["box_factor_sf01"] == 0.5
    assert b["rr_ratio_sf01"] == 0.5
    # box-normalized: the whole 'improvement' was the box
    assert b["rr_ratio_sf01_boxnorm"] == 1.0
    assert b["box_factor_sf1"] == 1.0
    assert b["rr_ratio_sf1"] == round(12.8 / 12.4, 4)
    assert b["rr_sf1_shared_queries"] == 2
    # raw scale ratio (0.4+12.4)/(0.1+3.0); deflated by bf01/bf1 = 0.5
    assert b["scale_ratio_boxnorm"] == round(
        b["scale_ratio_sf01_to_sf1"] * 0.5, 4
    )
    # the render carries the probe lines
    md = close_round.render_md(
        {"round": 5, "head": "deadbeefcafe", "bench": b,
         "fingerprint_diff": {}, "oldest_after_round": [],
         "window_check": {"matches_rule": True}, "window": []}
    )
    assert "box factor" in md and cal in md


def test_bench_block_box_factor_guard_on_plan_change(tmp_path, monkeypatch):
    """A probe whose plan CHANGED between rounds measures code, not the
    box — the factor must be withheld with a reason, never computed."""
    cal = close_round.CALIBRATION_QUERY
    with open(tmp_path / "BENCH_LOCAL_r04.json", "w") as f:
        json.dump(_bench(10.0, {cal: 0.2}, 0.1), f)
    with open(tmp_path / "BENCH_LOCAL_r05.json", "w") as f:
        json.dump(_bench(8.0, {cal: 0.1}, 0.1), f)
    with open(tmp_path / "PLANS_r04.json", "w") as f:
        json.dump({cal: "abc123"}, f)
    with open(tmp_path / "PLANS_r05.json", "w") as f:
        json.dump({cal: "CHANGED"}, f)
    monkeypatch.setattr(close_round, "REPO", str(tmp_path))
    b = close_round.bench_block(5)
    assert "box_factor_sf01" not in b
    assert "plan changed" in b["box_factor_sf01_unavailable"]
    # and with a missing PLANS file the reason is 'missing'
    (tmp_path / "PLANS_r04.json").unlink()
    b2 = close_round.bench_block(5)
    assert "missing PLANS fingerprint" in b2["box_factor_sf01_unavailable"]


def test_bench_block_reproduces_r11_judge_numbers():
    """Against the real committed artifacts: the judge computed 1.88×
    (the hand-typed COVERAGE.md number was 1.85×)."""
    b = close_round.bench_block(11)
    assert b["total_sf01"] == 25.5995
    assert b["total_sf1"] == 48.1185
    assert abs(b["scale_ratio_sf01_to_sf1"] - 1.88) < 0.01


def test_render_md_from_committed_r12_ledger():
    """--render-only path: the paste is derivable from CLOSING_r{N}.json
    alone (a close that dies between ledger write and the COVERAGE.md
    paste is recoverable without re-running pytest/replica)."""
    with open(os.path.join(close_round.REPO, "CLOSING_r12.json")) as f:
        out = json.load(f)
    md = close_round.render_md(out)
    lines = md.splitlines()
    assert lines[0].startswith(
        "### Round 12 closing (script-generated at HEAD "
    )
    assert out["head"][:9] in lines[0]
    assert f"registry {out['registry_size']}" in md
    assert out["pytest"]["summary"] in md
    assert out["replica"]["summary"] in md
    assert f"**{out['bench']['total_sf01']}s**" in md
    # every window entry appears with its provenance
    for row in out["window"]:
        assert f"`{row['entry']}` — {row['provenance']}" in md


def test_render_md_flags_dirty_tree_and_rule_mismatch():
    out = {
        "round": 99,
        "head": "a" * 40,
        "dirty": True,
        "registry_size": 2,
        "window": [{"entry": "x", "provenance": "NEW (never driver-attested)"}],
        "window_check": {
            "matches_rule": False,
            "missing_from_window": ["y"],
            "unexpected_in_window": ["x"],
        },
        "oldest_after_round": [{"entry": "y", "last_green": 3}],
        "fingerprint_diff": {},
        "bench": {"error": "sf0.1 artifact not committed"},
    }
    md = close_round.render_md(out)
    assert "DIRTY TREE" in md
    assert "window RULE MISMATCH" in md
    assert "* bench: sf0.1 artifact not committed" in md
