"""Cross-round bench HISTORY (VERDICT r10 #7 / r11 #2): the driver's
BENCH_rN.json keeps only a top-5 digest and bench_full.json is
overwritten per run, so establishing "is r(N) actually flat vs
r(N-1)?" used to take git archaeology (the judge diffed
`git show <hash>:bench_full.json` by hand in r11 to prove the driver's
+24% was host contention, not a regression).

This tool maintains ``BENCH_SUMMARY.jsonl`` — one line per bench run,
full per-entry timings + contention — and does the comparison that
archaeology produced:

  python tools/bench_summary.py backfill   # rebuild from git history
                                            # of bench_full.json +
                                            # BENCH_r*.json digests
  python tools/bench_summary.py            # table of all runs
  python tools/bench_summary.py compare    # last two full runs:
                                            # median per-entry ratio,
                                            # movers > 1.25x
  python tools/bench_summary.py compare -2 -1   # any two, by index

``bench.py`` appends every new run automatically (label via
$SPARK_GRAFT_BENCH_LABEL), so after one backfill the file stays
current without this tool.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SUMMARY = REPO / "BENCH_SUMMARY.jsonl"

MOVER_RATIO = 1.25
# sub-second entries flap on scheduling noise; the r11 judge analysis
# only trusted movers that were also non-trivial in absolute terms
MOVER_MIN_SEC = 1.0

# suspect bands (VERDICT r12 "what's wrong" #1: a no-arg compare of a
# contention-2.54 run against a 1.73 run printed `FASTER (0.917)` — a
# pure load artifact presented as a performance verdict). A record is
# load-suspect when any of:
#   - its own contention_suspect stamp is true (bench.py: median
#     per-entry ratio vs the quietest recorded run >= 1.15)
#   - mc_vs_best_known > 1.6 — the multi-core probe against the best
#     ever recorded. The committed band comes from the r12 history:
#     the unflagged quiet records (driver 144.1 s, builder 150.5 s)
#     both stamp 1.47, while every load-colored run stamps >= 1.64
#     (1.64 / 1.89 / 2.04 / 2.39 / 2.42 / 3.29) — 1.6 splits the two
#     populations with margin on both sides
#   - contention_ratio >= 2.0 — for backfilled records predating the
#     r12 stamps; the hardware floor is ~1.6 at guest-idle, so >= 2.0
#     is unambiguous load
MC_VS_BEST_BAND = 1.6
CONTENTION_RATIO_SUSPECT = 2.0


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def load_lines() -> list[dict]:
    if not SUMMARY.exists():
        return []
    out = []
    for ln in SUMMARY.read_text().splitlines():
        ln = ln.strip()
        if ln:
            out.append(json.loads(ln))
    return out


def backfill() -> None:
    lines: list[dict] = []
    # every historical version of bench_full.json, oldest first
    hashes = _git(
        "log", "--reverse", "--format=%H %cI %s", "--", "bench_full.json"
    ).splitlines()
    seen: set[str] = set()
    for h in hashes:
        sha, iso, *subj = h.split(" ", 2) + [""]
        try:
            raw = _git("show", f"{sha}:bench_full.json")
        except subprocess.CalledProcessError:
            continue
        if not raw.strip():
            continue
        rec = json.loads(raw)
        key = f"{rec.get('value')}|{len(rec.get('queries', {}))}"
        if key in seen:  # same run re-committed
            continue
        seen.add(key)
        rec["ts"] = iso
        rec["label"] = f"git:{sha[:8]} {(subj[0] if subj else '')[:60]}"
        rec["source"] = "git"
        lines.append(rec)
    # the working-tree copy (may be newer than any commit)
    wt = REPO / "bench_full.json"
    if wt.exists() and wt.read_text().strip():
        rec = json.loads(wt.read_text())
        key = f"{rec.get('value')}|{len(rec.get('queries', {}))}"
        if key not in seen:
            rec["ts"] = ""
            rec["label"] = "worktree"
            rec["source"] = "worktree"
            lines.append(rec)
    # driver digests (top-5 only, but they carry the official per-round
    # total + the driver box's contention stamp)
    for p in sorted(REPO.glob("BENCH_r*.json")):
        d = json.loads(p.read_text())
        parsed = d.get("parsed") or {}
        if not parsed:
            continue
        lines.append(
            {
                "metric": parsed.get("metric"),
                "value": parsed.get("value"),
                "unit": "sec",
                "queries": parsed.get("queries", {}),
                "contention_ratio": parsed.get("contention_ratio"),
                "sf": d.get("sf"),
                "ts": "",
                "label": f"driver:{p.name}",
                "source": "driver-digest",
                "round": d.get("n"),
            }
        )
    SUMMARY.write_text("".join(json.dumps(x) + "\n" for x in lines))
    print(f"wrote {len(lines)} records to {SUMMARY.name}")


def _is_full(rec: dict) -> bool:
    """A run with a full per-entry table (>= 20 entries)."""
    return len(rec.get("queries", {})) >= 20


def table() -> None:
    lines = load_lines()
    if not lines:
        print("no BENCH_SUMMARY.jsonl — run `backfill` first")
        return
    print("| # | ts | label | sf | entries | total s | contention |")
    print("|---|---|---|---|---|---|---|")
    for i, x in enumerate(lines):
        mark = "*" if _is_full(x) else " "
        print(
            f"| {i}{mark} | {x.get('ts', '')[:19]} | "
            f"{x.get('label', '')[:48]} | {x.get('sf')} | "
            f"{len(x.get('queries', {}))} | "
            f"{x.get('value')} | {x.get('contention_ratio')} |"
        )
    print(
        "\n(* = full per-entry record; pass these GLOBAL indices to"
        " `compare i j` — same-sf pairs only)"
    )


def suspect_reasons(rec: dict) -> list[str]:
    """Why this record's timings are NOT load-trustworthy (empty =
    clean). See the band constants above for the thresholds."""
    reasons = []
    if rec.get("contention_suspect") is True:
        reasons.append("contention_suspect=true")
    mc = rec.get("mc_vs_best_known")
    if isinstance(mc, (int, float)) and mc > MC_VS_BEST_BAND:
        reasons.append(f"mc_vs_best_known {mc} > {MC_VS_BEST_BAND}")
    cr = rec.get("contention_ratio")
    if (
        rec.get("contention_suspect") is None
        and rec.get("mc_vs_best_known") is None
        and isinstance(cr, (int, float))
        and cr >= CONTENTION_RATIO_SUSPECT
    ):
        # pre-r12 record with no stamps: fall back to the raw ratio
        reasons.append(
            f"contention_ratio {cr} >= {CONTENTION_RATIO_SUSPECT}"
        )
    return reasons


def compare(ia: int | None = None, ib: int | None = None) -> None:
    """Default: the latest NON-SUSPECT full run vs the previous
    non-suspect full run AT THE SAME scale factor — a loaded run must
    never be silently presented as a performance verdict (the r12
    failure: no-arg compare printed `FASTER (0.917)` across a
    contention-2.54/1.73 pair). When no clean pair exists the tool
    REFUSES and lists candidates; explicit indices always run but the
    verdict is stamped SUSPECT when either side is load-flagged.
    Explicit indices are the GLOBAL row numbers `table()` prints."""
    lines = load_lines()
    if ia is not None or ib is not None:
        a, b = lines[ia], lines[ib]
        for rec, i in ((a, ia), (b, ib)):
            if not _is_full(rec):
                raise SystemExit(
                    f"record #{i} ({rec.get('label', '')!r}) has no full "
                    "per-entry table — pick a *-marked row"
                )
        if a.get("sf") != b.get("sf"):
            raise SystemExit(
                f"records #{ia} (sf {a.get('sf')}) and #{ib} "
                f"(sf {b.get('sf')}) ran at different scale factors — "
                "per-entry ratios across sf are meaningless"
            )
    else:
        # backfilled driver DIGESTS carry no timestamp and append after
        # the chronological git records, so they would masquerade as
        # "latest"; the default pairing uses real full runs only
        fulls = [
            x
            for x in lines
            if _is_full(x) and x.get("source") != "driver-digest"
        ]
        if not fulls:
            print("no full runs; run `backfill` first")
            return
        sf = fulls[-1].get("sf")
        same_sf = [x for x in fulls if x.get("sf") == sf]
        clean = [x for x in same_sf if not suspect_reasons(x)]
        if len(clean) < 2:
            print(
                f"REFUSING no-arg compare: fewer than two load-clean "
                f"full runs at sf {sf} (clean={len(clean)}, "
                f"total={len(same_sf)}). Candidates:"
            )
            for x in same_sf:
                i = lines.index(x)
                why = suspect_reasons(x) or ["clean"]
                print(
                    f"  #{i} {x.get('label', '')[:48]!r} total "
                    f"{x.get('value')} @ contention "
                    f"{x.get('contention_ratio')} — {'; '.join(why)}"
                )
            raise SystemExit(
                "pass explicit indices (`compare i j`) to force — the "
                "verdict will carry SUSPECT"
            )
        a, b = clean[-2], clean[-1]
    qa, qb = a["queries"], b["queries"]
    shared = sorted(set(qa) & set(qb))
    ratios = {k: qb[k] / qa[k] for k in shared if qa[k] > 0}
    med = statistics.median(ratios.values())
    print(
        f"A: {a.get('label')} total {a.get('value')} "
        f"@ contention {a.get('contention_ratio')}"
    )
    print(
        f"B: {b.get('label')} total {b.get('value')} "
        f"@ contention {b.get('contention_ratio')}"
    )
    print(
        f"shared entries: {len(shared)}   median per-entry ratio B/A: "
        f"{med:.3f}"
    )
    movers = [
        (k, r)
        for k, r in sorted(ratios.items(), key=lambda kv: -kv[1])
        if (r >= MOVER_RATIO or r <= 1 / MOVER_RATIO)
        and max(qa[k], qb[k]) >= MOVER_MIN_SEC
    ]
    if movers:
        print(f"\nmovers (ratio >= {MOVER_RATIO}x either way, "
              f">= {MOVER_MIN_SEC}s):")
        print("| entry | A s | B s | B/A |")
        print("|---|---|---|---|")
        for k, r in movers:
            print(f"| {k} | {qa[k]:.3f} | {qb[k]:.3f} | {r:.2f} |")
    else:
        print("no movers — per-entry performance is flat")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print(f"only in A: {', '.join(only_a)}")
    if only_b:
        print(f"only in B: {', '.join(only_b)}")
    # one-line verdict the round notes can quote directly; a verdict
    # over a load-flagged side is stamped SUSPECT so it can never be
    # quoted as a performance result (VERDICT r12 #1)
    tag = (
        "FLAT"
        if 0.95 <= med <= 1.05
        else ("FASTER" if med < 0.95 else "SLOWER")
    )
    why = {"A": suspect_reasons(a), "B": suspect_reasons(b)}
    suspect = bool(why["A"] or why["B"])
    if suspect:
        tag = f"SUSPECT ({tag}?)"
        print(
            "\nWARNING: load-flagged side(s) — this ratio measures host "
            "contention, not code:"
        )
        for side, reasons in why.items():
            if reasons:
                print(f"  {side}: {'; '.join(reasons)}")
    print(
        json.dumps(
            {
                "metric": "bench_round_over_round",
                "median_entry_ratio": round(med, 4),
                "verdict": tag,
                "suspect": suspect,
                "suspect_reasons": {k: v for k, v in why.items() if v},
                "movers": {k: round(r, 3) for k, r in movers},
                "contention": [
                    a.get("contention_ratio"),
                    b.get("contention_ratio"),
                ],
            }
        )
    )


def main() -> None:
    argv = sys.argv[1:]
    if argv[:1] == ["backfill"]:
        backfill()
    elif argv[:1] == ["compare"]:
        idx = [int(x) for x in argv[1:3]]
        compare(*idx) if idx else compare()
    else:
        table()


if __name__ == "__main__":
    main()
