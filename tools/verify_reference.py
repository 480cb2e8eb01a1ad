#!/usr/bin/env python
"""Re-verify SURVEY.md's [U]-grade API-shape claims against the real
reference source, if/when `/root/reference/` is populated.

Background (SURVEY.md §0): the reference mount was EMPTY at survey time,
so every file/class/method name in SURVEY.md §2-§3 is tagged [U] —
unverified recall of github.com/wgurecky/bipymc. The capability contract
([B], from BASELINE.json) is safe regardless; this script is the cheap
insurance for the one unverifiable axis left: if the mount ever appears,
run it to grade each [U] claim VERIFIED / MISSING / RELOCATED and emit
`REFCHECK.json` + a human-readable report, so API-shape parity claims can
be re-cited with real file:line evidence.

Usage:  python tools/verify_reference.py [--ref /root/reference] [--json out]
Exit codes: 0 = mount populated, report written; 2 = mount empty/absent.
"""

import argparse
import json
import os
import re
import sys

# The [U] claims from SURVEY.md §2 (layer map locations) and §3
# (component inventory "Key classes/functions"). Each entry: the claimed
# symbol (class/function/method/attr), the claimed file (repo-relative,
# None = no specific file claimed), and the SURVEY line it backs.
CLAIMS = [
    # §2 layer map files
    ("file", None, "bipymc/chain.py", "SURVEY §2 L2"),
    ("file", None, "bipymc/samplers.py", "SURVEY §2 L3"),
    ("file", None, "bipymc/demc.py", "SURVEY §2 L1/L3"),
    ("file", None, "bipymc/dream.py", "SURVEY §2 L1/L3"),
    ("file", None, "bipymc/util.py", "SURVEY §2 L5"),
    ("file", None, "bipymc/mc_plot.py", "SURVEY §2 L5"),
    ("dir", None, "bipymc/gp", "SURVEY §2 L4"),
    ("dir", None, "examples", "SURVEY §2 L6"),
    ("dir", None, "tests", "SURVEY §2 L7"),
    # §3 component inventory symbols
    ("class", "McmcProposal", "bipymc/samplers.py", "SURVEY §3 proposals"),
    ("class", "GaussianProposal", "bipymc/samplers.py", "SURVEY §3 proposals"),
    ("class", "McmcChain", "bipymc/chain.py", "SURVEY §3 chain storage"),
    ("def", "var_ball", None, "SURVEY §3 chain storage / §4.10"),
    ("class", "McmcSampler", "bipymc/samplers.py", "SURVEY §3 MH"),
    ("class", "Metropolis", "bipymc/samplers.py", "SURVEY §3 MH"),
    ("class", "AdaptiveMetropolis", "bipymc/samplers.py", "SURVEY §3 AM"),
    ("class", "DrMetropolis", "bipymc/samplers.py", "SURVEY §3 DR"),
    ("class", "Dram", "bipymc/samplers.py", "SURVEY §3 DRAM"),
    ("class", "DeMc", "bipymc/demc.py", "SURVEY §3 DE-MC"),
    ("class", "DeMcZ", "bipymc/dream.py", "SURVEY §3 DE-MC-z"),
    ("class", "DreamZs", "bipymc/dream.py", "SURVEY §3 DREAM-zs"),
    # API-surface claims (method/attr names, any file)
    ("def", "run_mcmc", None, "SURVEY §2 L3 public interface"),
    ("attr", "chain", None, "SURVEY §2 L3 results access"),
    ("attr", "super_chain", None, "SURVEY §2 L3 results access"),
]


def scan_reference(ref_root):
    """Index every .py file: path -> list of (lineno, kind, name)."""
    index = {}
    for dirpath, _dirnames, filenames in os.walk(ref_root):
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, ref_root)
            symbols = []
            try:
                with open(path, errors="replace") as f:
                    for i, line in enumerate(f, 1):
                        m = re.match(r"\s*(class|def)\s+(\w+)", line)
                        if m:
                            symbols.append((i, m.group(1), m.group(2)))
                        for am in re.finditer(
                                r"self\.(\w+)\s*=|def (\w+)\s*\(", line):
                            name = am.group(1) or am.group(2)
                            symbols.append((i, "attr", name))
            except OSError as e:
                print(f"  ! unreadable: {rel}: {e}", file=sys.stderr)
            index[rel] = symbols
    return index


def grade(claims, index):
    results = []
    for kind, symbol, claimed_file, cite in claims:
        entry = {"kind": kind, "symbol": symbol, "claimed_file": claimed_file,
                 "survey_cite": cite}
        if kind in ("file", "dir"):
            hit = any(rel == claimed_file or rel.startswith(claimed_file + "/")
                      or os.path.dirname(rel) == claimed_file
                      for rel in index)
            entry["status"] = "VERIFIED" if hit else "MISSING"
            results.append(entry)
            continue
        # symbol claims: exact-kind match first, any-kind match second
        hits, loose = [], []
        for rel, symbols in index.items():
            for lineno, k, name in symbols:
                if name != symbol:
                    continue
                ok_kind = (k == kind) or (kind == "attr")
                (hits if ok_kind else loose).append((rel, lineno))
        if not hits and loose:
            hits = loose
        if not hits:
            entry["status"] = "MISSING"
        else:
            entry["found"] = [f"{rel}:{lineno}" for rel, lineno in hits[:5]]
            in_claimed = claimed_file is None or any(
                rel == claimed_file for rel, _ in hits)
            entry["status"] = "VERIFIED" if in_claimed else "RELOCATED"
        results.append(entry)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--json", default=None,
                    help="output path (default <repo>/REFCHECK.json)")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = args.json or os.path.join(repo, "REFCHECK.json")

    populated = os.path.isdir(args.ref) and any(
        fns for _, _, fns in os.walk(args.ref))
    if not populated:
        print(f"{args.ref} is empty or absent — nothing to verify "
              "(SURVEY.md §0 condition unchanged). [U] claims stay [U].")
        return 2

    index = scan_reference(args.ref)
    print(f"indexed {len(index)} python files under {args.ref}")
    results = grade(CLAIMS, index)

    counts = {}
    for r in results:
        counts[r["status"]] = counts.get(r["status"], 0) + 1
        loc = f" @ {', '.join(r['found'])}" if r.get("found") else ""
        print(f"  [{r['status']:9s}] {r['kind']:5s} "
              f"{r['symbol'] or r['claimed_file']}{loc}  ({r['survey_cite']})")
    report = {"reference_root": args.ref, "files_indexed": len(index),
              "counts": counts, "claims": results}
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nsummary: {counts} -> {out_path}")
    print("Next: update SURVEY.md [U] tags with the file:line evidence "
          "above; re-check RELOCATED/MISSING claims by hand (renames are "
          "likely, capability is the contract).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
