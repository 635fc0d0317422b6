#!/usr/bin/env python3
"""Consistency check: COVERAGE.md's query references vs the queries that
actually exist in SparkEntry (grepped from the `"name" -> QDef` defs).

Catches two drift modes after a round of additions:
  - COVERAGE.md citing a query id that no longer exists (stale doc);
  - an implemented query never mentioned in COVERAGE.md (undocumented op).

Understands the doc's range notation (q05-q10 / en-dash) by expanding the
numeric span within one family prefix.
"""
import re, subprocess, sys

COV = "COVERAGE.md"
FAMS = "qgvdtscmub"

def implemented():
    src = subprocess.run(
        ["grep", "-rhoE", '"[a-z][0-9]{2}_[a-z0-9_]+" -> QDef', "src/main/scala/"],
        capture_output=True, text=True).stdout
    return set(re.findall(r'"([a-z][0-9]{2})_', src))

def referenced(text):
    refs = set()
    for m in re.finditer(rf"\b([{FAMS}])([0-9]{{2}})(?:_[a-z0-9_]+)?\b", text):
        refs.add(m.group(1) + m.group(2))
    # expand ranges like "q05-q10" / "c01–c04" (ASCII hyphen or en-dash)
    for fam, lo, fam2, hi in re.findall(
            rf"\b([{FAMS}])([0-9]{{2}})[–-]([{FAMS}])([0-9]{{2}})\b", text):
        if fam == fam2:
            for i in range(int(lo), int(hi) + 1):
                refs.add(f"{fam}{i:02d}")
    return refs

def main():
    impl = implemented()
    refs = referenced(open(COV).read())
    stale = sorted(refs - impl)
    undocumented = sorted(impl - refs)
    print(f"{len(impl)} implemented queries, {len(refs)} referenced in {COV}")
    if stale:
        print("STALE doc references (no such query):", stale)
    if undocumented:
        print("UNDOCUMENTED queries (not in COVERAGE.md):", undocumented)
    if stale or undocumented:
        sys.exit(1)
    print("OK: COVERAGE.md and SparkEntry agree")

if __name__ == "__main__":
    main()
