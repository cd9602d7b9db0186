#!/bin/bash
# min-of-N fresh-session measurement for a set of registry queries.
# Usage: measure_r7.sh OUTFILE N query [query ...]
# Each pass is one warm-session bench_extra invocation; per-query minimum
# across passes is the steal-robust number (host steal inflates, never
# deflates). Load average is logged per pass.
OUT=$1; N=$2; shift 2
: > "$OUT"
for i in $(seq 1 "$N"); do
  echo "pass $i load=$(cat /proc/loadavg)" >> "$OUT"
  python bench_extra.py --warm --reps 1 "$@" 2>/dev/null | grep '"query"' >> "$OUT"
done
python3 - "$OUT" <<'EOF'
import json, sys, collections
best = collections.defaultdict(list)
for line in open(sys.argv[1]):
    line = line.strip()
    if line.startswith('{'):
        d = json.loads(line)
        if d.get("min") is not None:
            best[d["query"]].append(d["min"])
print("== min of passes ==")
for q, v in best.items():
    print(f"{min(v):8.3f}  (runs: {sorted(v)})  {q}")
EOF
