#!/usr/bin/env python3
"""Refresh the bench ledger from the round's final clean bench run.

Reads target/bench-latest.json (written by graft.Bench) and rewrites
 - scripts/bench_ledger.json       {entry: median seconds}  — the
   commit-time presence gate (GateLintSpec / check.py) and the
   cross-round regression baseline
 - scripts/bench_ledger_mins.json  {entry: min seconds}     — each
   entry's NOISE FLOOR under the drift convention (STATUS r17): a
   real regression moves the min, ambient contention only moves the
   median. Persisted here because target/ is gitignored, so without
   this file the next round has no min baseline to compare against.
 - scripts/bench_ledger_cpu.json   {entry: median-sample process-CPU
   seconds} — the work-vs-work baseline (★r19): wall ratios mix real
   regressions with machine-epoch shifts, but an entry's process-CPU
   measures the WORK done; cur_cpu >> ledger_cpu is a real change in
   computation regardless of how slow the machine was.

Keys already in the ledger but absent from the run (e.g. a
SPARK_GRAFT_ONLY partial run) keep their old readings — refresh from
a FULL run at sf0.1 for a clean baseline.

Usage: python3 scripts/refresh_ledger.py [path/to/bench-latest.json]
"""
import json
import sys
from pathlib import Path

root = Path(__file__).resolve().parent.parent
latest_path = Path(sys.argv[1]) if len(sys.argv) > 1 \
    else root / "target" / "bench-latest.json"
ledger_path = root / "scripts" / "bench_ledger.json"
mins_path = root / "scripts" / "bench_ledger_mins.json"

latest = json.loads(latest_path.read_text())

# ★r22 (VERDICT r21 #3): the r21 close refreshed from a run whose own
# epoch_ratio read 1.345 — every baseline median rose ~35% and the
# absolute min-floor signal went soft by the same factor (2.5× on the
# CDC gates). A ledger is a BASELINE: refreshing it from a degraded
# epoch softens the self-gate for every later round. Refuse when the
# run's self-measured epoch_ratio exceeds 1.15 unless --force (and say
# why); an epoch_ratio <= 0 means no prior ledger to compare against
# (first refresh), which is fine.
epoch = latest.get("epoch_ratio", -1)
if epoch > 1.15 and "--force" not in sys.argv:
    print(f"REFUSING refresh: this run's epoch_ratio is {epoch:.3f} "
          f"(> 1.15) — the machine was degraded, and baselining on it "
          f"would soften every later round's floors. Re-run the bench "
          f"on a quiet epoch, or pass --force to override.")
    sys.exit(1)

queries = latest.get("queries", {})
query_mins = latest.get("query_mins", {})
query_cpu = latest.get("queries_cpu", {})
ledger = json.loads(ledger_path.read_text()) if ledger_path.exists() else {}
old_mins = json.loads(mins_path.read_text()) if mins_path.exists() else {}
cpu_path = root / "scripts" / "bench_ledger_cpu.json"
old_cpu = json.loads(cpu_path.read_text()) if cpu_path.exists() else {}

kept = sorted(k for k in ledger if k not in queries)
new_ledger = {k: (round(queries[k], 3) if k in queries else ledger[k])
              for k in set(ledger) | set(queries)}
# merge mins exactly like medians: a partial (SPARK_GRAFT_ONLY) run
# must not wipe the noise-floor baselines of the entries it skipped
new_mins = {k: (round(query_mins[k], 3) if k in query_mins
                else old_mins[k])
            for k in new_ledger
            if k in query_mins or k in old_mins}
new_cpu = {k: (round(query_cpu[k], 3) if k in query_cpu else old_cpu[k])
           for k in new_ledger
           if k in query_cpu or k in old_cpu}

for path, data in ((ledger_path, new_ledger), (mins_path, new_mins),
                   (cpu_path, new_cpu)):
    path.write_text(json.dumps(dict(sorted(data.items())), indent=1) + "\n")

print(f"ledger: {len(new_ledger)} keys -> {ledger_path}")
print(f"mins:   {len(new_mins)} keys -> {mins_path}")
print(f"cpu:    {len(new_cpu)} keys -> {cpu_path}")
if kept:
    print(f"kept stale (not in this run): {', '.join(kept)}")
