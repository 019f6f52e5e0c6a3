#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a fresh graft.Bench JSON line against a committed reference
(tools/bench_reference.json by default) and fails if any query exceeds
FACTOR x its recorded time AND the absolute floor (sub-second queries
triple from scheduler noise alone; the floor keeps the gate signal).

Usage:
  python3 tools/bench_gate.py BENCH_NEW.json [REFERENCE.json]
  python3 tools/bench_gate.py --update BENCH_NEW.json   # refresh reference

Exit 1 on regression; prints each offender as
  REGRESSION q_name: 4.10s vs 0.61s reference (6.7x > 3.0x)
"""
import json
import sys
from pathlib import Path

FACTOR = 3.0
FLOOR_SEC = 1.0
DEFAULT_REF = Path(__file__).resolve().parent / "bench_reference.json"


def load_queries(path):
    text = Path(path).read_text()
    # accept either a bare JSON object or a log containing one JSON line
    for line in text.splitlines():
        line = line.strip()
        start = line.find('{"metric"')
        if start >= 0:
            obj = json.loads(line[start:])
            return obj.get("queries", obj)
    obj = json.loads(text)
    return obj.get("queries", obj)


def main(argv):
    if argv and argv[0] == "--update":
        queries = load_queries(argv[1])
        DEFAULT_REF.write_text(json.dumps(queries, indent=1, sort_keys=True) + "\n")
        print(f"reference updated: {len(queries)} queries -> {DEFAULT_REF}")
        return 0
    cand = load_queries(argv[0])
    ref = load_queries(argv[1] if len(argv) > 1 else DEFAULT_REF)
    regressions, missing = [], []
    for q, ref_s in sorted(ref.items()):
        if q not in cand:
            missing.append(q)
            continue
        cand_s = cand[q]
        if cand_s > FACTOR * ref_s and cand_s > FLOOR_SEC:
            regressions.append(
                f"REGRESSION {q}: {cand_s:.2f}s vs {ref_s:.2f}s reference "
                f"({cand_s / ref_s:.1f}x > {FACTOR}x)")
    for q in missing:
        print(f"MISSING {q}: in reference but not in candidate bench")
    for r in regressions:
        print(r)
    new = sorted(set(cand) - set(ref))
    if new:
        print(f"note: {len(new)} queries not in reference: {', '.join(new)}")
    ok = not regressions and not missing
    print(("OK" if ok else "FAIL") +
          f": {len(cand)} queries vs {len(ref)} reference, "
          f"{len(regressions)} regressions, {len(missing)} missing")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
