"""Summarize PERF_AB.jsonl: one ranked table of the A/B flag configs.

Usage: python scripts/digest_ab.py [path/to/PERF_AB.jsonl]

Keeps the LAST record per config name (re-runs supersede), ranks by
headline ms, and prints the speedup vs the `base` config so the
flip-winners-to-defaults decision (NOTES.md digestion checklist) is one
glance.
"""

import json
import pathlib
import sys


def main():
    path = pathlib.Path(
        sys.argv[1] if len(sys.argv) > 1
        else pathlib.Path(__file__).resolve().parent.parent / "PERF_AB.jsonl"
    )
    last = {}
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        rec = json.loads(line)
        last[rec["config"]] = rec

    base = ((last.get("base") or {}).get("bench") or {}).get("value")
    rows = []
    for name, rec in last.items():
        bench = rec.get("bench") or {}
        val = bench.get("value")
        rows.append(
            (
                val if val is not None else float("inf"),
                name,
                val,
                bench.get("ms_heavy"),
                rec.get("rc"),
                rec.get("elapsed_s"),
            )
        )
    rows.sort()

    print(f"{'config':<18} {'ms':>9} {'vs base':>8} {'heavy':>9} {'rc':>7} {'wall s':>7}")
    for _, name, val, heavy, rc, wall in rows:
        speed = f"{base / val:6.3f}x" if base and val else "      -"
        print(
            f"{name:<18} {val if val is not None else '-':>9} {speed:>8} "
            f"{heavy if heavy is not None else '-':>9} {rc!s:>7} {wall!s:>7}"
        )


if __name__ == "__main__":
    main()
