#!/usr/bin/env python3
"""Plan-metric sweep over graft.Explain output.

Reads one or more files containing `===== <query> =====` sections of
explain("formatted") output and prints, per query: unique parquet Scan
nodes, Exchange+BroadcastExchange nodes, Generate nodes, Window nodes.
Used for the duplicate-subtree audit (round 13/14) and as the source of
the scan-count bounds pinned by PlanSweepSpec.

Usage: plan_sweep.py explain_output.txt [more.txt ...]
"""
import re
import sys


def sweep(text):
    sections = re.split(r"^===== (\S+) =====$", text, flags=re.M)
    out = {}
    # sections: [prefix, name1, body1, name2, body2, ...]
    for i in range(1, len(sections) - 1, 2):
        name, body = sections[i], sections[i + 1]
        # tree lines reference nodes as `Op (id)`; details as `(id) Op`.
        # Count UNIQUE node ids per operator class (the tree renders a
        # reused subtree once per reference, details list each node once).
        def ids(pattern):
            s = set(re.findall(r"\((\d+)\) " + pattern, body))
            s |= set(re.findall(pattern + r"[^(\n]*\((\d+)\)", body))
            return s

        out[name] = {
            "scans": len(ids(r"Scan parquet")),
            "exchanges": len(ids(r"Exchange")) + len(ids(r"BroadcastExchange")),
            "generates": len(ids(r"Generate")),
            "windows": len(ids(r"Window")),
        }
    return out


def main():
    merged = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            merged.update(sweep(f.read()))
    w = max((len(n) for n in merged), default=10)
    print(f"{'query'.ljust(w)}  scans  exchanges  generates  windows")
    for name in sorted(merged):
        m = merged[name]
        print(f"{name.ljust(w)}  {m['scans']:5d}  {m['exchanges']:9d}"
              f"  {m['generates']:9d}  {m['windows']:7d}")


if __name__ == "__main__":
    main()
