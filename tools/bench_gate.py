#!/usr/bin/env python3
"""Per-query bench regression gate.

Compares a fresh graft.Bench JSON line against a committed reference
(tools/bench_reference.json by default) and fails if any query exceeds
FACTOR x its recorded time AND the absolute floor (sub-second queries
triple from scheduler noise alone; the floor keeps the gate signal).

Usage:
  python3 tools/bench_gate.py BENCH_NEW.json [REFERENCE.json]
  python3 tools/bench_gate.py --update RUN1.json RUN2.json RUN3.json [...]

--update refuses fewer than 3 clean runs and records the per-query MEDIAN
across them. A single run's minimum is not a reference: scheduler luck
produces unrepresentatively tight floors that manufacture false regression
marks (r12's q_pricing_summary sat at 3.8x a lucky 0.23 s minimum and
re-measured HIGHER than its first pass — the reference was the defect).
The median of >=3 runs is robust to one lucky and one unlucky run.

Exit 1 on regression; prints each offender as
  REGRESSION q_name: 4.10s vs 0.61s reference (6.7x > 2.0x)
"""
import json
import re
import statistics
import sys
from pathlib import Path

FACTOR = 2.0
FLOOR_SEC = 0.5
DEFAULT_REF = Path(__file__).resolve().parent / "bench_reference.json"


def _from_metric_text(text):
    """Scan free text (a log, or the driver's `tail` string) for Bench's JSON
    lines; prefer the full all_queries map over the slowest-50 summary.
    Returns (queries, partial): partial=True when only the slowest-50
    summary survived (the driver keeps a bounded stdout tail that usually
    truncates the all_queries line), so absence from the map means "fast",
    not "missing"."""
    dec = json.JSONDecoder()
    best = None
    idx = 0
    while True:
        start = text.find('{"metric"', idx)
        if start < 0:
            break
        try:
            obj, _ = dec.raw_decode(text[start:])
            q = obj.get("queries")
            if isinstance(q, dict) and q:
                if obj.get("metric") == "all_queries":
                    return q, False
                best = best or q
        except ValueError:
            pass
        idx = start + 1
    return best, best is not None


def load_queries(path):
    """Returns (queries, partial) — see _from_metric_text for `partial`."""
    text = Path(path).read_text()
    # 1. driver BENCH_r*.json: a wrapper object whose "tail" string embeds the
    #    Bench stdout lines (escaped) and whose "parsed" holds the summary
    try:
        obj = json.loads(text)
        if isinstance(obj, dict) and ("tail" in obj or "parsed" in obj):
            q, partial = _from_metric_text(obj.get("tail") or "")
            if q is None and isinstance(obj.get("parsed"), dict):
                q, partial = obj["parsed"].get("queries"), True
            if q:
                return q, partial
            raise SystemExit(f"no bench queries found in driver file {path}")
        if isinstance(obj, dict) and "metric" in obj:
            return obj.get("queries", obj), obj.get("metric") != "all_queries"
        if isinstance(obj, dict):
            return obj, False  # bare {query: sec} reference map
    except json.JSONDecodeError:
        pass
    # 2. a raw sbt/Bench log containing the JSON lines
    q, partial = _from_metric_text(text)
    if q is None:
        raise SystemExit(f"no bench queries found in {path}")
    return q, partial


def main(argv):
    if argv and argv[0] == "--update":
        run_paths = argv[1:]
        if len(run_paths) < 3:
            raise SystemExit(
                f"refusing --update from {len(run_paths)} run(s): a reference "
                "is the MEDIAN of >=3 clean runs (one run's timings are "
                "scheduler luck, see module docstring)")
        runs = []
        cpus_seen = set()
        for p in run_paths:
            loaded, partial = load_queries(p)
            if partial:
                raise SystemExit(f"refusing --update: {p} is a partial "
                                 "(slowest-50) artifact; use the full "
                                 "all_queries line")
            runs.append({q: s for q, s in loaded.items()
                         if q.startswith("q_") and s >= 0})
            m = re.search(r'"cpus"\s*:\s*(\d+)', Path(p).read_text())
            if m:
                cpus_seen.add(int(m.group(1)))
        common = set(runs[0])
        for r in runs[1:]:
            common &= set(r)
        uneven = sorted(set().union(*runs) - common)
        if uneven:
            raise SystemExit(
                "refusing --update: queries not present (or errored) in every "
                f"run: {', '.join(uneven)} — the median needs all runs")
        queries = {q: round(statistics.median(r[q] for r in runs), 3)
                   for q in sorted(common)}
        if len(cpus_seen) > 1:
            raise SystemExit(f"refusing --update: runs at mixed core counts "
                             f"{sorted(cpus_seen)} — a reference is one box "
                             "at one core count")
        if cpus_seen:
            # Bench widens its burst-defense trigger by __cpus/currentCpus
            # when a run (the driver's scaling control) uses fewer cores
            # than the reference was measured at.
            queries["__cpus"] = cpus_seen.pop()
        DEFAULT_REF.write_text(json.dumps(queries, indent=1, sort_keys=True) + "\n")
        print(f"reference updated: {len(queries)} queries (median of "
              f"{len(runs)} runs) -> {DEFAULT_REF}")
        return 0
    cand, cand_partial = load_queries(argv[0])
    ref, _ = load_queries(argv[1] if len(argv) > 1 else DEFAULT_REF)
    # Bench marks queries that threw as -1; they must fail the gate, never
    # read as "fast", and must never enter the reference on --update.
    errored = sorted(q for q, s in cand.items() if q.startswith("q_") and s < 0)
    cand = {q: s for q, s in cand.items() if q.startswith("q_") and s >= 0}
    # drop non-query entries ("__cpus" metadata) from the reference side
    ref = {q: s for q, s in ref.items() if q.startswith("q_") and s >= 0}
    regressions, missing = [], []
    for q, ref_s in sorted(ref.items()):
        if q not in cand:
            # a partial candidate only lists the slowest-50: absence = fast
            if not cand_partial:
                missing.append(q)
            continue
        cand_s = cand[q]
        if cand_s > FACTOR * ref_s and cand_s > FLOOR_SEC:
            regressions.append(
                f"REGRESSION {q}: {cand_s:.2f}s vs {ref_s:.2f}s reference "
                f"({cand_s / ref_s:.1f}x > {FACTOR}x)")
    for q in errored:
        print(f"ERRORED {q}: bench recorded a failure (-1), no timing exists")
    for q in missing:
        print(f"MISSING {q}: in reference but not in candidate bench")
    for r in regressions:
        print(r)
    new = sorted(set(cand) - set(ref))
    if new:
        print(f"note: {len(new)} queries not in reference: {', '.join(new)}")
    ok = not regressions and not missing and not errored
    print(("OK" if ok else "FAIL") +
          f": {len(cand)} queries vs {len(ref)} reference, "
          f"{len(regressions)} regressions, {len(missing)} missing, "
          f"{len(errored)} errored")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
