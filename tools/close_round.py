"""Mechanized round-closing ledger (VERDICT r10 task 1).

Three rounds running, the only defect class the judge found was
hand-written closing claims drifting from committed artifacts (r8
window math, r9 rotation claim, r10 fingerprint/count drift).  This
tool derives every closing number FROM artifacts at the current HEAD,
so the ledger can only say what the repo can prove:

* **window composition** — computed from CORRECTNESS_r01..r{N-1}.json
  (last driver-green round per entry) against the actual first-50
  ``_WINDOW`` in ``__spark_entry__.py``: per-entry provenance (NEW /
  changed / stale-rotation with its last-green round) plus the
  post-round staleness tail (oldest non-window attestations left).
* **pytest + replica counts** — optionally RUN at HEAD
  (``--run-pytest`` / ``--run-replica``) and parsed, never typed.
* **plan-fingerprint diff** — regenerates PLANS_r{N}(.full) via
  ``tools/plan_fingerprints.py`` (``--run-fingerprints``), diffs
  against the previous round's committed file, and detects NORMALIZER
  DRIFT: if ``plan_fingerprints.py`` changed after the commit that
  wrote the r{N-1} baseline, the old file is not comparable — the tool
  says so, and ``--rebase-prev`` regenerates the r{N-1} baseline by
  checking the r{N-1} commit out into a temp git worktree and running
  the CURRENT normalizer against the OLD code (written to
  ``PLANS_r{N-1}_rebased.json``).

Writes ``CLOSING_r{N}.json`` and prints a ready-to-paste markdown
block.  Every number in the block carries its source.

Usage:
  python tools/close_round.py --round 11 [--run-pytest] [--run-replica]
      [--run-fingerprints] [--rebase-prev <commit>] [--changed a,b,c]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# frozen box-speed probe for bench_block's box factor: a cheap
# expression-only headline query whose plan fingerprint has been
# byte-identical for rounds — cross-round movement on it measures the
# BOX, not the code (VERDICT r12 task 2)
CALIBRATION_QUERY = "clean_names"
sys.path.insert(0, REPO)


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()


def _artifact(name: str) -> str:
    """Resolve a round artifact: repo root first, then ``archive/``
    (historical rounds are moved there to keep the root navigable —
    r13; the ledger must keep reproducing across the move)."""
    p = os.path.join(REPO, name)
    if os.path.exists(p):
        return p
    return os.path.join(REPO, "archive", name)


def last_green_rounds(upto: int) -> dict[str, int]:
    """entry -> last round with a fully green driver row (hash match)."""
    green: dict[str, int] = {}
    for r in range(1, upto + 1):
        p = _artifact(f"CORRECTNESS_r{r:02d}.json")
        if not os.path.exists(p):
            continue
        with open(p) as f:
            d = json.load(f)
        for name, row in d.items():
            ok = (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and (row.get("hash_match") in (True, None))
                and not row.get("err")
            )
            if ok:
                green[name] = r
    return green


def registry_and_window() -> tuple[list[str], list[str]]:
    import __spark_entry__ as entry

    qs = list(entry.queries())
    return qs, qs[:50]


def recommended_window(
    registry: list[str],
    green: dict[str, int],
    changed: set[str],
    size: int = 50,
) -> list[str]:
    """The r7 composition rule, computed: (a) never-attested entries
    (new gates) first, (b) entries whose code changed this round, then
    (c) the stalest attestations oldest-first (alphabetical within a
    round).  Returns the recommended SET as an ordered list."""
    new = [n for n in registry if n not in green]
    chg = [n for n in registry if n in changed and n in green]
    rest = sorted(
        (n for n in registry if n in green and n not in changed),
        key=lambda n: (green[n], n),
    )
    out = []
    for group in (new, chg, rest):
        for n in group:
            if len(out) >= size:
                break
            if n not in out:
                out.append(n)
    return out[:size]


def window_check(
    registry: list[str],
    window: list[str],
    green: dict[str, int],
    changed: set[str],
) -> dict:
    """Set-diff the ACTUAL first-50 window against the rule's
    recommendation.  Ordering inside the window is presentation;
    composition is the contract."""
    rec = recommended_window(registry, green, changed, size=len(window))
    actual, want = set(window), set(rec)
    return {
        "matches_rule": actual == want,
        "missing_from_window": sorted(want - actual),
        "unexpected_in_window": sorted(actual - want),
    }


def run_pytest() -> dict:
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=no"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    tail = (p.stdout or "").strip().splitlines()[-1] if p.stdout else ""
    m = re.search(r"(\d+) passed", tail)
    f = re.search(r"(\d+) failed", tail)
    return {
        "summary": tail,
        "passed": int(m.group(1)) if m else None,
        "failed": int(f.group(1)) if f else 0,
    }


def run_replica() -> dict:
    p = subprocess.run(
        [sys.executable, "tools/check_correctness.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=5400,
    )
    tail = (p.stdout or "").strip().splitlines()
    line = next((x for x in reversed(tail) if "ok," in x), "")
    m = re.search(r"(\d+) ok, (\d+) failed, (\d+) rows-only", line)
    return {
        "summary": line,
        "ok": int(m.group(1)) if m else None,
        "failed": int(m.group(2)) if m else None,
        "rows_only": int(m.group(3)) if m else None,
    }


def run_fingerprints(round_no: int, full: bool) -> str:
    suffix = "_full" if full else ""
    out_path = os.path.join(REPO, f"PLANS_r{round_no:02d}{suffix}.json")
    args = [sys.executable, "tools/plan_fingerprints.py"]
    if full:
        args.append("--all")
    p = subprocess.run(
        args, cwd=REPO, capture_output=True, text=True, timeout=3600, check=True
    )
    with open(out_path, "w") as f:
        f.write(p.stdout)
    return out_path


def normalizer_drift(prev_round: int) -> dict:
    """Did plan_fingerprints.py change after the commit that wrote the
    previous round's baseline?  If yes the old file isn't comparable."""
    prev_file = f"PLANS_r{prev_round:02d}.json"
    if not os.path.exists(os.path.join(REPO, prev_file)):
        return {"comparable": False, "reason": f"{prev_file} missing"}
    base_commit = _git("log", "--format=%H", "-1", "--", prev_file)
    tool_commits = _git(
        "log", "--format=%H", f"{base_commit}..HEAD", "--",
        "tools/plan_fingerprints.py",
    ).splitlines()
    rebased = os.path.exists(
        os.path.join(REPO, f"PLANS_r{prev_round:02d}_rebased.json")
    )
    return {
        "comparable": not tool_commits or rebased,
        "normalizer_commits_since_baseline": tool_commits,
        "rebased_baseline_exists": rebased,
        "baseline_commit": base_commit,
    }


def rebase_prev(prev_round: int, commit: str, full: bool = True) -> str:
    """Regenerate the r{prev} baseline: old code, CURRENT normalizer."""
    tmp = tempfile.mkdtemp(prefix="pj_rebase_")
    out_path = os.path.join(REPO, f"PLANS_r{prev_round:02d}_rebased.json")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", tmp, commit],
            cwd=REPO, check=True, capture_output=True,
        )
        shutil.copy(
            os.path.join(REPO, "tools", "plan_fingerprints.py"),
            os.path.join(tmp, "tools", "plan_fingerprints.py"),
        )
        args = [sys.executable, "tools/plan_fingerprints.py"]
        if full:
            args.append("--all")
        env = dict(os.environ, PYTHONPATH=tmp)
        p = subprocess.run(
            args, cwd=tmp, capture_output=True, text=True,
            timeout=3600, check=True, env=env,
        )
        with open(out_path, "w") as f:
            f.write(p.stdout)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", tmp],
            cwd=REPO, capture_output=True,
        )
    return out_path


def fingerprint_diff(round_no: int) -> dict:
    prev = round_no - 1
    drift = normalizer_drift(prev)
    base_name = (
        f"PLANS_r{prev:02d}_rebased.json"
        if drift.get("rebased_baseline_exists")
        else f"PLANS_r{prev:02d}.json"
    )
    cur_name = f"PLANS_r{round_no:02d}.json"
    base_p = os.path.join(REPO, base_name)
    cur_p = os.path.join(REPO, cur_name)
    if not (os.path.exists(base_p) and os.path.exists(cur_p)):
        return {"drift": drift, "err": "baseline or current file missing"}
    with open(base_p) as f:
        base = json.load(f)
    with open(cur_p) as f:
        cur = json.load(f)
    movers = sorted(
        k for k in cur if k in base and cur[k] != base[k]
    )
    return {
        "drift": drift,
        "baseline_file": base_name,
        "current_file": cur_name,
        "movers": movers,
        "added": sorted(set(cur) - set(base)),
        "removed": sorted(set(base) - set(cur)),
        "unchanged": len([k for k in cur if base.get(k) == cur[k]]),
    }


def bench_block(round_no: int) -> dict:
    """Bench ratios COMPUTED from committed BENCH_LOCAL artifacts
    (VERDICT r11 task 2: the one drifted number in the r11 closing was
    a hand-typed scale ratio — 1.85× vs the committed artifacts'
    1.88×).  Reads BENCH_LOCAL_r{N}[,_sf1].json and the newest prior
    round's files, emits totals, per-query r/r ratios over the shared
    query set, and the sf0.1→sf1 scale ratio.  Missing artifacts are
    reported, never guessed."""

    def _load(name):
        p = _artifact(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _prev(suffix):
        for r in range(round_no - 1, 0, -1):
            d = _load(f"BENCH_LOCAL_r{r:02d}{suffix}.json")
            if d is not None:
                return r, d
        return None, None

    out: dict = {"sources": {}}
    cur = _load(f"BENCH_LOCAL_r{round_no:02d}.json")
    cur1 = _load(f"BENCH_LOCAL_r{round_no:02d}_sf1.json")
    prev_r, prev = _prev("")
    prev1_r, prev1 = _prev("_sf1")
    if cur is None:
        out["error"] = f"BENCH_LOCAL_r{round_no:02d}.json not committed"
        return out
    out["sources"][f"sf{cur.get('sf')}"] = f"BENCH_LOCAL_r{round_no:02d}.json"
    out["total_sf01"] = round(float(cur["value"]), 4)
    if prev is not None:
        out["sources"]["prev"] = f"BENCH_LOCAL_r{prev_r:02d}.json"
        out["prev_total_sf01"] = round(float(prev["value"]), 4)
        shared = sorted(
            set(cur.get("queries", {})) & set(prev.get("queries", {}))
        )
        out["rr_ratio_sf01"] = round(
            sum(cur["queries"][q] for q in shared)
            / max(1e-9, sum(prev["queries"][q] for q in shared)),
            4,
        )
        out["rr_shared_queries"] = len(shared)
        ratios = sorted(
            (round(cur["queries"][q] / max(1e-9, prev["queries"][q]), 4), q)
            for q in shared
        )
        out["rr_best"] = [{"query": q, "ratio": r} for r, q in ratios[:3]]
        out["rr_worst"] = [
            {"query": q, "ratio": r} for r, q in ratios[-3:][::-1]
        ]
    if cur1 is not None:
        out["sources"]["sf1"] = f"BENCH_LOCAL_r{round_no:02d}_sf1.json"
        out["total_sf1"] = round(float(cur1["value"]), 4)
        shared1 = sorted(
            set(cur.get("queries", {})) & set(cur1.get("queries", {}))
        )
        out["scale_ratio_sf01_to_sf1"] = round(
            sum(cur1["queries"][q] for q in shared1)
            / max(1e-9, sum(cur["queries"][q] for q in shared1)),
            4,
        )
        if prev1 is not None:
            out["sources"]["prev_sf1"] = f"BENCH_LOCAL_r{prev1_r:02d}_sf1.json"
            # shared-query intersection, matching rr_ratio_sf01 — a raw
            # total ratio silently goes apples-to-oranges the day the
            # sf1 suite composition changes (ADVICE r12)
            shared_s1 = sorted(
                set(cur1.get("queries", {})) & set(prev1.get("queries", {}))
            )
            out["rr_ratio_sf1"] = round(
                sum(cur1["queries"][q] for q in shared_s1)
                / max(1e-9, sum(prev1["queries"][q] for q in shared_s1)),
                4,
            )
            out["rr_sf1_shared_queries"] = len(shared_s1)
    else:
        out["sf1"] = f"BENCH_LOCAL_r{round_no:02d}_sf1.json not committed"

    # ---- box-factor calibration (VERDICT r12 task 2) ----------------
    # One frozen, cheap, expression-only query is the box-speed probe:
    # its plan has been fingerprint-identical for rounds, so ANY
    # cross-round movement on it is the box, not the code.  Dividing
    # the r/r ratios by the probe's own ratio separates plan-level
    # change from box-level drift — the "uniform box factor" prose
    # argument becomes a number in the ledger.  Guard: the probe ratio
    # is only trusted when the probe's PLANS fingerprint is unchanged
    # between the two rounds being compared.
    cal = CALIBRATION_QUERY

    def _fp(rno: int):
        d = _load(f"PLANS_r{rno:02d}.json")
        return None if d is None else d.get(cal)

    def _boxf(cur_d, prev_d, prev_rno):
        if cur_d is None or prev_d is None:
            return None, "missing artifact"
        if cal not in cur_d.get("queries", {}) or cal not in prev_d.get(
            "queries", {}
        ):
            return None, f"{cal} absent from a suite"
        f_cur, f_prev = _fp(round_no), _fp(prev_rno)
        if f_cur is None or f_prev is None:
            return None, "missing PLANS fingerprint"
        if f_cur != f_prev:
            return None, f"{cal} plan changed ({f_prev} -> {f_cur})"
        return (
            round(cur_d["queries"][cal] / max(1e-9, prev_d["queries"][cal]), 4),
            None,
        )

    out["calibration_query"] = cal
    bf01, why01 = _boxf(cur, prev, prev_r)
    if bf01 is not None:
        out["box_factor_sf01"] = bf01
        if "rr_ratio_sf01" in out:
            out["rr_ratio_sf01_boxnorm"] = round(
                out["rr_ratio_sf01"] / max(1e-9, bf01), 4
            )
    elif why01:
        out["box_factor_sf01_unavailable"] = why01
    bf1, why1 = _boxf(cur1, prev1, prev1_r)
    if bf1 is not None:
        out["box_factor_sf1"] = bf1
        if "rr_ratio_sf1" in out:
            out["rr_ratio_sf1_boxnorm"] = round(
                out["rr_ratio_sf1"] / max(1e-9, bf1), 4
            )
    elif why1:
        out["box_factor_sf1_unavailable"] = why1
    # scale-ratio deflation: the r12 drift class was the box running
    # the sf0.1 and sf1 suites at different speeds (different moments);
    # deflating each suite total by ITS OWN box factor re-expresses
    # both in prev-round box units before taking the ratio
    if bf01 is not None and bf1 is not None and "scale_ratio_sf01_to_sf1" in out:
        out["scale_ratio_boxnorm"] = round(
            out["scale_ratio_sf01_to_sf1"] * bf01 / max(1e-9, bf1), 4
        )
    return out


def render_md(out: dict) -> str:
    """Ready-to-paste markdown, derived ONLY from the ledger dict.

    Factored out of ``main`` so ``--render-only`` can re-print the
    paste for an already-written ``CLOSING_r{N}.json`` without
    re-running pytest/replica — a round close that dies between ledger
    generation and the COVERAGE.md paste is recoverable losslessly.
    """
    n = out["round"]
    head = out["head"]
    dirty = out.get("dirty", False)
    md = [f"### Round {n} closing (script-generated at HEAD {head[:9]}"
          f"{', DIRTY TREE' if dirty else ''})", ""]
    if "pytest" in out:
        md.append(f"* pytest: **{out['pytest']['summary']}**")
    if "replica" in out:
        md.append(f"* full replica: **{out['replica']['summary']}** "
                  f"(registry {out['registry_size']})")
    fd = out["fingerprint_diff"]
    if "movers" in fd:
        cmp_note = ("" if fd["drift"]["comparable"]
                    else " — NORMALIZER CHANGED since baseline; diff vs "
                         "un-rebased file is NOT meaningful")
        md.append(
            f"* plan fingerprints vs {fd['baseline_file']}: "
            f"{fd['unchanged']} unchanged, movers: "
            f"{', '.join(fd['movers']) or 'none'}"
            f"{'; new: ' + ', '.join(fd['added']) if fd['added'] else ''}"
            f"{cmp_note}"
        )
    wc = out["window_check"]
    if wc["matches_rule"]:
        md.append("* window composition MATCHES the r7 rule "
                  "(new → changed → oldest-first), verified by set-diff")
    else:
        md.append(
            f"* window RULE MISMATCH — missing: "
            f"{wc['missing_from_window']}; unexpected: "
            f"{wc['unexpected_in_window']}"
        )
    md.append("* window composition (entry — provenance):")
    for row in out["window"]:
        md.append(f"  * `{row['entry']}` — {row['provenance']}")
    md.append("* oldest attestations remaining after this round: "
              + ", ".join(f"`{t['entry']}` r{t['last_green']}"
                          for t in out["oldest_after_round"][:6]))
    b = out["bench"]
    if "error" in b:
        md.append(f"* bench: {b['error']}")
    else:
        line = (f"* bench (computed from {b['sources']}): "
                f"sf0.1 total **{b['total_sf01']}s**")
        if "rr_ratio_sf01" in b:
            line += (f", r/r **{b['rr_ratio_sf01']}×** over "
                     f"{b['rr_shared_queries']} shared queries")
        if "total_sf1" in b:
            line += (f"; sf1 total **{b['total_sf1']}s**, scale ratio "
                     f"sf0.1→sf1 **{b['scale_ratio_sf01_to_sf1']}×**")
            if "rr_ratio_sf1" in b:
                line += f" (sf1 r/r {b['rr_ratio_sf1']}×)"
        md.append(line)
        if "rr_best" in b:
            md.append("  * biggest movers: best "
                      + ", ".join(f"`{t['query']}` {t['ratio']}×"
                                  for t in b["rr_best"])
                      + "; worst "
                      + ", ".join(f"`{t['query']}` {t['ratio']}×"
                                  for t in b["rr_worst"]))
        cal_bits = []
        if "box_factor_sf01" in b:
            cal_bits.append(f"sf0.1 box **{b['box_factor_sf01']}×** → "
                            f"r/r box-normalized "
                            f"**{b.get('rr_ratio_sf01_boxnorm', 'n/a')}×**")
        if "box_factor_sf1" in b:
            cal_bits.append(f"sf1 box **{b['box_factor_sf1']}×** → "
                            f"r/r box-normalized "
                            f"**{b.get('rr_ratio_sf1_boxnorm', 'n/a')}×**")
        if "scale_ratio_boxnorm" in b:
            cal_bits.append(
                f"scale ratio box-normalized **{b['scale_ratio_boxnorm']}×**"
            )
        if cal_bits:
            md.append(f"  * box factor (probe `{b['calibration_query']}`, "
                      f"fingerprint-frozen): " + "; ".join(cal_bits))
        for k in ("box_factor_sf01_unavailable",
                  "box_factor_sf1_unavailable"):
            if k in b:
                md.append(f"  * {k.replace('_', ' ')}: {b[k]}")
    return "\n".join(md)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--changed", default="",
                    help="comma list of entries whose CODE changed this round")
    ap.add_argument("--run-pytest", action="store_true")
    ap.add_argument("--run-replica", action="store_true")
    ap.add_argument("--run-fingerprints", action="store_true")
    ap.add_argument("--rebase-prev", metavar="COMMIT",
                    help="regenerate r{N-1} fingerprint baseline from this "
                         "commit under the CURRENT normalizer")
    ap.add_argument("--render-only", action="store_true",
                    help="re-print the paste from the existing "
                         "CLOSING_r{N}.json; no recomputation")
    args = ap.parse_args()
    n = args.round
    if args.render_only:
        with open(os.path.join(REPO, f"CLOSING_r{n:02d}.json")) as f:
            print(render_md(json.load(f)))
        return
    changed = {c for c in args.changed.split(",") if c}

    head = _git("rev-parse", "HEAD")
    dirty = _git("status", "--porcelain")
    green = last_green_rounds(n - 1)
    registry, window = registry_and_window()

    window_rows = []
    for name in window:
        if name not in green:
            prov = "NEW (never driver-attested)"
        elif name in changed:
            prov = f"changed code (last green r{green[name]})"
        else:
            prov = f"stale rotation (last green r{green[name]})"
        window_rows.append({"entry": name, "provenance": prov})

    # staleness tail AFTER this round, assuming the window goes green
    post = dict(green)
    for name in window:
        post[name] = n
    tail = sorted(
        ((post.get(name, 0), name) for name in registry if name in post),
        key=lambda t: (t[0], t[1]),
    )[:10]
    never = [name for name in registry if name not in post]

    out = {
        "round": n,
        "head": head,
        "dirty": bool(dirty),
        "registry_size": len(registry),
        "window": window_rows,
        "window_check": window_check(registry, window, green, changed),
        "oldest_after_round": [
            {"entry": name, "last_green": r} for r, name in tail
        ],
        "never_gateable_or_new": never,
    }
    if args.rebase_prev:
        out["rebased_baseline"] = rebase_prev(n - 1, args.rebase_prev)
    if args.run_fingerprints:
        out["fingerprints_headline"] = run_fingerprints(n, full=False)
        out["fingerprints_full"] = run_fingerprints(n, full=True)
    out["fingerprint_diff"] = fingerprint_diff(n)
    out["bench"] = bench_block(n)
    if args.run_pytest:
        out["pytest"] = run_pytest()
    if args.run_replica:
        out["replica"] = run_replica()

    with open(os.path.join(REPO, f"CLOSING_r{n:02d}.json"), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)

    print(render_md(out))


if __name__ == "__main__":
    main()
