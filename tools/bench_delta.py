#!/usr/bin/env python3
"""Per-gate bench attribution: diff two BENCH_DETAIL*.json (or any file
with a {"queries": {gate: sec}} map) and print the gates that moved,
grouped by family, so a total-line regression is named, not waved at
(VERDICT r14 "What's wrong" #4).

Usage: bench_delta.py <old.json> <new.json> [abs_floor_sec=0.05]
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    q = d.get("queries", d)
    return {k: v for k, v in q.items() if isinstance(v, (int, float)) and v >= 0}


def family(gate):
    for p in ("bt_", "doc_", "emb_", "mm_", "rel_", "stream_"):
        if gate.startswith(p):
            return p.rstrip("_")
    return "other"


def main(old_path, new_path, floor=0.05):
    old, new = load(old_path), load(new_path)
    shared = sorted(set(old) & set(new))
    t_old = sum(old[k] for k in shared)
    t_new = sum(new[k] for k in shared)
    pct = f", {100 * (t_new / t_old - 1):+.1f}%" if t_old > 0 else ""
    print(f"shared gates: {len(shared)}  total {t_old:.3f}s -> {t_new:.3f}s "
          f"({t_new - t_old:+.3f}s{pct})")
    added = sorted(set(new) - set(old))
    gone = sorted(set(old) - set(new))
    if added:
        print(f"added ({sum(new[k] for k in added):.3f}s): "
              + ", ".join(f"{k}={new[k]:.3f}" for k in added))
    if gone:
        print(f"removed ({sum(old[k] for k in gone):.3f}s): "
              + ", ".join(f"{k}={old[k]:.3f}" for k in gone))

    fams = {}
    for k in shared:
        fams.setdefault(family(k), []).append(k)
    print("\nby family:")
    for f in sorted(fams, key=lambda f: -(sum(new[k] - old[k] for k in fams[f]))):
        ks = fams[f]
        fo, fn = sum(old[k] for k in ks), sum(new[k] for k in ks)
        print(f"  {f:8s} {len(ks):3d} gates  {fo:8.3f} -> {fn:8.3f}  ({fn - fo:+.3f})")

    moved = [(new[k] - old[k], k) for k in shared if abs(new[k] - old[k]) >= floor]
    moved.sort(reverse=True)
    print(f"\ngates moved >= {floor:.2f}s:")
    for d, k in moved:
        print(f"  {k:40s} {old[k]:7.3f} -> {new[k]:7.3f}  ({d:+.3f})")


if __name__ == "__main__":
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.05
    main(sys.argv[1], sys.argv[2], floor)
