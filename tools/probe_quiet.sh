#!/bin/bash
# Bracketed-quiet scale probe (r16 verdict #5): the watch-close protocol
# that previously lived in PERF.md prose + ad-hoc sessions, as a runnable
# tool. Runs ONE (or a comma-list of) graft.Scale10x row(s) bracketed by
# host canaries, retries until BOTH endpoint canaries are quiet, and emits
# a certified reading — the number a PERF.md watch entry may quote.
#
# Usage: tools/probe_quiet.sh <row[,row...]> [copies] [max_attempts] [out]
#   e.g. tools/probe_quiet.sh exact_substr 100
#        tools/probe_quiet.sh gate_probe,gate_reprobe 1000 6
#
# Scale copies are reused across attempts (SPARK_GRAFT_REUSE=1 — the 100x
# build writes ~6 GB; rebuilding per attempt would time the build). Canary
# bar matches tools/bench_gate.md (0.032 s warm DuckDB sf0.1 aggregate).
# Certified output: the Scale10x row JSON + canary_pre/canary_post fields,
# written to $OUT and printed. Exit 1 if no quiet window within attempts.
#
# NOTE: sub-second absolutes at probe scale are mostly the JVM
# scan/schedule floor — decompose t1 vs t100 MARGINAL cost before reading
# a ratio as a defect (PERF.md floor-vs-marginal discipline).
set -u
ROWS=${1:?usage: tools/probe_quiet.sh <row[,row...]> [copies] [max_attempts] [out]}
COPIES=${2:-100}
MAX=${3:-6}
OUT=${4:-/tmp/PROBE_QUIET_$(echo "$ROWS" | tr ',' '_')_${COPIES}x.json}
CANARY_BAR=${PROBE_QUIET_BAR:-0.032}
. "$(dirname "$0")/canary.sh"
BAR=$CANARY_BAR
quiet() { canary_quiet "$1"; }

RAW=/tmp/probe_quiet_raw_$$.json
for i in $(seq 1 "$MAX"); do
  # a STALE raw file from a prior noisy attempt must never ship under a
  # later attempt's quiet canaries — delete before every run so a silent
  # sbt failure (output is discarded) leaves nothing to mis-certify
  rm -f "$RAW"
  pre=$(canary)
  echo "[probe_quiet] attempt $i/$MAX pre-canary $pre (bar $BAR)"
  if ! quiet "$pre"; then
    echo "[probe_quiet] host degraded, sleeping 90s"
    sleep 90
    continue
  fi
  SPARK_GRAFT_COPIES=$COPIES SPARK_GRAFT_REUSE=1 SPARK_GRAFT_ONLY=$ROWS \
    sbt -batch "runMain graft.Scale10x $RAW" >/dev/null 2>&1 \
    || echo "[probe_quiet] sbt run failed (attempt $i)"
  post=$(canary)
  echo "[probe_quiet] attempt $i post-canary $post"
  if quiet "$post" && [ -s "$RAW" ]; then
    # fail-CLOSED (ADVICE r17): CERTIFIED and exit 0 only if the cert
    # writer itself succeeded AND the output file exists non-empty — a
    # crashed writer must not leave the script claiming a certificate
    if python3 - "$RAW" "$OUT" "$pre" "$post" "$ROWS" "$COPIES" <<'EOF' && [ -s "$OUT" ]; then
import json, sys
raw, out, pre, post, rows, copies = sys.argv[1:7]
d = json.load(open(raw))
keep = {k: v for k, v in d.items()
        if k != "_meta" and any(k.startswith(r) for r in rows.split(","))}
cert = {"rows": keep, "copies": int(copies),
        "canary_pre": float(pre), "canary_post": float(post),
        "certified": "both endpoint canaries quiet (bracketed window)"}
json.dump(cert, open(out, "w"), indent=1)
print(json.dumps(cert, indent=1))
EOF
      echo "[probe_quiet] CERTIFIED reading written to $OUT"
      rm -f "$RAW"
      exit 0
    fi
    echo "[probe_quiet] cert writer failed (attempt $i), retrying"
  fi
  echo "[probe_quiet] window went noisy mid-probe, retrying"
  sleep 60
done
echo "[probe_quiet] no quiet window in $MAX attempts"
exit 1
