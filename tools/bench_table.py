"""Per-query round-over-round bench table (VERDICT r3 #8: bench hygiene).

Reads every ``BENCH_r*.json`` (driver-recorded) plus optional extra bench
JSON files given as arguments (e.g. this round's builder run, before the
driver records it) and prints a markdown table: one row per query with the
round it entered the sweep and its wall time per round — plus the
LIKE-FOR-LIKE headline (sum over the intersection of query sets), so a
growing sweep can't masquerade as a regression (r3's 66.06 vs r2's 74.06
understated the real −14% because four queries were new).

    python tools/bench_table.py [extra_bench.json ...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_bench(path: str) -> dict | None:
    """Accept either the driver wrapper ({tail: '...{json}'}) or the raw
    one-line bench JSON."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    tail = d.get("tail", "")
    m = re.search(r"\{\"metric\".*", tail)
    return json.loads(m.group(0)) if m else None


def main(extra: list[str]) -> int:
    rounds: list[tuple[str, dict]] = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        label = re.search(r"BENCH_r0*(\d+)", p).group(1)
        d = load_bench(p)
        if d:
            rounds.append((f"r{label}", d))
    for i, p in enumerate(extra):
        d = load_bench(p)
        if d:
            rounds.append((f"r{len(rounds) + 1}*", d))

    names = [lbl for lbl, _ in rounds]
    qsets = {lbl: d["queries"] for lbl, d in rounds}
    first_round = {}
    for lbl, d in rounds:
        for q in d["queries"]:
            first_round.setdefault(q, lbl.rstrip("*"))

    all_qs = sorted(first_round, key=lambda q: -qsets[names[-1]].get(q, 0.0))
    print("| query | added | " + " | ".join(f"{n} (s)" for n in names) + " |")
    print("|---|---|" + "---|" * len(names))
    for q in all_qs:
        cells = [f"{qsets[n][q]:.2f}" if q in qsets[n] else "—"
                 for n in names]
        print(f"| {q} | {first_round[q]} | " + " | ".join(cells) + " |")
    totals = [f"**{sum(qsets[n].values()):.2f}**" for n in names]
    print("| **total (full sweep)** | | " + " | ".join(totals) + " |")

    # like-for-like: every adjacent round pair over the query intersection
    print()
    for (la, da), (lb, db) in zip(rounds, rounds[1:]):
        qa, qb = da["queries"], db["queries"]
        shared = set(qa) & set(qb)
        sa, sb = sum(qa[q] for q in shared), sum(qb[q] for q in shared)
        print(f"like-for-like {la}->{lb} ({len(shared)} shared queries): "
              f"{sa:.2f} -> {sb:.2f} s ({(sb - sa) / sa * 100:+.1f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
