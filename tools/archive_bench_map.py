#!/usr/bin/env python3
"""Snapshot the driver's standing bench map sidecar into the per-round
archive the history table reads.

Every `graft.Bench` run OVERWRITES `BENCH_rNEXT_map.json`; the driver's
round artifact `BENCH_r{N}.json` keeps only the stdout tail, whose
ladder drops the per-query map once the board is large (r13+: 145+
queries overflow every ladder level). `tools/bench_history.py` already
knows to read `BENCH_r{N}_map.json` beside the artifact — this script
creates that file, guarded by the same trust rule the history script
applies (run totals must agree to 0.1 s, so a stale or local sidecar
can never masquerade as the driver's run).

Run it at ROUND START, before any local bench run clobbers the sidecar:

    python3 tools/archive_bench_map.py        # newest BENCH_r{N}.json
    python3 tools/archive_bench_map.py 17     # a specific round

If the working-tree sidecar doesn't match (a local run already
overwrote it), the script searches `git log -- BENCH_rNEXT_map.json`
for a committed sidecar whose total matches the artifact (the round-18
recovery path that restored the r16 column).
"""
import glob
import json
import os
import re
import subprocess
import sys

SIDE = "BENCH_rNEXT_map.json"


def load(path):
    with open(path) as f:
        return json.load(f)


def matches(side_obj, parsed):
    return (side_obj.get("queries")
            and abs(side_obj.get("value", -1) - parsed.get("value", -2)) < 0.1)


def main():
    if len(sys.argv) > 1:
        rounds = [int(sys.argv[1])]
    else:
        rounds = sorted(
            int(re.match(r"BENCH_r(\d+)\.json", os.path.basename(p)).group(1))
            for p in glob.glob("BENCH_r[0-9]*.json")
            if re.match(r"BENCH_r(\d+)\.json", os.path.basename(p)))
        rounds = rounds[-1:]
    for n in rounds:
        art, dst = f"BENCH_r{n}.json", f"BENCH_r{n}_map.json"
        parsed = (load(art).get("parsed") or {})
        if os.path.exists(dst):
            if matches(load(dst), parsed):
                print(f"{dst}: already archived and matching — nothing to do")
                continue
            print(f"{dst}: EXISTS but total mismatches {art} — refusing to "
                  "overwrite; inspect by hand")
            sys.exit(1)
        if parsed.get("queries"):
            print(f"{art}: stdout line carried the full map — no sidecar "
                  "needed")
            continue
        # 1) working-tree sidecar
        if os.path.exists(SIDE) and matches(load(SIDE), parsed):
            with open(SIDE) as f, open(dst, "w") as g:
                g.write(f.read())
            print(f"{dst}: archived from working-tree {SIDE} "
                  f"(total {parsed.get('value'):.3f} s)")
            continue
        # 2) git archaeology over committed sidecars
        log = subprocess.run(
            ["git", "log", "--all", "--format=%H", "--", SIDE],
            capture_output=True, text=True, check=True).stdout.split()
        for sha in log:
            raw = subprocess.run(["git", "show", f"{sha}:{SIDE}"],
                                 capture_output=True, text=True)
            if raw.returncode != 0:
                continue
            side_obj = json.loads(raw.stdout)
            if matches(side_obj, parsed):
                with open(dst, "w") as g:
                    g.write(raw.stdout)
                print(f"{dst}: archived from commit {sha[:9]} "
                      f"(total {parsed.get('value'):.3f} s)")
                break
        else:
            print(f"{art}: no matching sidecar in tree or history — the "
                  "run's map is unrecoverable")
            sys.exit(1)


if __name__ == "__main__":
    main()
