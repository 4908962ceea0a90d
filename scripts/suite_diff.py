"""Round-over-round suite regression diff.

The round-3 verdict flagged a 51% Exterior regression (1.99 -> 3.01 ms)
that shipped unnoticed because nothing compared suite rows across runs.
This differ makes every suite run self-checking: give it the previous
round's JSON and the new one, and it prints a table of every scene row
whose ms/frame moved more than THRESHOLD (default 25% — outside the
documented +/-15% noise band with margin), plus a one-line JSON summary
the campaign log keeps.

    python scripts/suite_diff.py OLD.json NEW.json [--threshold 0.25]

Exit code 0 always (a regression is a finding, not a failure — the
campaign must keep running the rest of the battery); the caller decides
what to do with the report.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def load_rows(path: str) -> dict:
    """{scene-label: row} from a suite JSON (list of per-scene dicts)."""
    rows = json.loads(Path(path).read_text())
    return {r["scene"]: r for r in rows if "scene" in r}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.25,
                    help="relative ms/frame move that counts as a finding")
    args = ap.parse_args()

    old = load_rows(args.old)
    new = load_rows(args.new)

    moved = []
    print(f"suite diff: {args.old} -> {args.new} "
          f"(threshold {args.threshold:.0%})")
    print(f"{'scene':<64} {'old ms':>10} {'new ms':>10} {'change':>8}")
    for scene, row in new.items():
        prev = old.get(scene)
        if prev is None:
            print(f"{scene:<64} {'-':>10} {row['ms_per_frame']:>10.3f} "
                  f"{'NEW':>8}")
            continue
        o = float(prev["ms_per_frame"])
        n = float(row["ms_per_frame"])
        rel = (n - o) / o if o > 0 else 0.0
        mark = ""
        if abs(rel) > args.threshold:
            mark = " <-- REGRESSION" if rel > 0 else " <-- improvement"
            moved.append({"scene": scene, "old_ms": round(o, 3),
                          "new_ms": round(n, 3), "change": round(rel, 3)})
        print(f"{scene:<64} {o:>10.3f} {n:>10.3f} {rel:>+7.1%}{mark}")
    gone = sorted(set(old) - set(new))
    for scene in gone:
        print(f"{scene:<64} {old[scene]['ms_per_frame']:>10.3f} "
              f"{'-':>10} {'GONE':>8}")

    print(json.dumps({
        "old": args.old, "new": args.new, "threshold": args.threshold,
        "regressions": [m for m in moved if m["change"] > 0],
        "improvements": [m for m in moved if m["change"] < 0],
        "missing_rows": gone,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
