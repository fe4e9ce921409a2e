#!/usr/bin/env python3
"""Structural diff of persisted EXPLAIN FORMATTED plans (the PLANS/ dir
the bench writes): strips expression IDs, plan IDs and codegen IDs so
only genuine plan-shape changes surface — exchanges appearing, joins
changing strategy, pushdown disappearing — instead of renumbering noise.

Usage:
  diff_plans.py <dirA> <dirB>          # e.g. a git checkout's PLANS vs ./PLANS
  git show HEAD~1:PLANS/q.txt | diff_plans.py - PLANS/q.txt
"""
import difflib
import os
import re
import sys


def canon(text: str) -> str:
    text = re.sub(r"#\d+L?", "#x", text)
    text = re.sub(r"plan_id=\d+", "plan_id=x", text)
    text = re.sub(r"\[codegen id : \d+\]", "[codegen id : x]", text)
    text = re.sub(r"\[id=#x\]", "[id=#x]", text)
    # temp/checkpoint paths and UUID-suffixed sink names vary per run
    text = re.sub(r"[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}", "<uuid>", text)
    text = re.sub(r"stream_(wc|dd|un)_[0-9a-f]+", r"stream_\1_<uuid>", text)
    text = re.sub(r"/tmp/[\w.-]+", "/tmp/<dir>", text)
    return text


def read(path: str) -> str:
    if path == "-":
        return sys.stdin.read()
    with open(path) as f:
        return f.read()


def diff_one(name: str, a: str, b: str) -> bool:
    ca, cb = canon(a).splitlines(), canon(b).splitlines()
    if ca == cb:
        return False
    print(f"=== {name} CHANGED ===")
    for line in difflib.unified_diff(ca, cb, lineterm="", n=1):
        if line.startswith(("+", "-")) and not line.startswith(("+++", "---")):
            print(" ", line)
    return True


def main(argv):
    a, b = argv[1], argv[2]
    if a == "-" or os.path.isfile(a):
        changed = diff_one(b if a == "-" else a, read(a), read(b))
        return 1 if changed else 0
    names = sorted(set(os.listdir(a)) | set(os.listdir(b)))
    n_changed = 0
    for n in names:
        pa, pb = os.path.join(a, n), os.path.join(b, n)
        if not os.path.exists(pa):
            print(f"=== {n} ADDED ===")
            n_changed += 1
        elif not os.path.exists(pb):
            print(f"=== {n} REMOVED ===")
            n_changed += 1
        elif diff_one(n, read(pa), read(pb)):
            n_changed += 1
    print(f"\n{n_changed} plan(s) structurally changed, {len(names) - n_changed} identical")
    return 1 if n_changed else 0


if __name__ == "__main__":
    try:
        sys.exit(main(sys.argv))
    except BrokenPipeError:  # |head etc.
        sys.exit(0)
