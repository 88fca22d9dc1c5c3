#!/bin/sh
# Round-open checklist step: the driver writes its per-round artifacts
# (VERDICT/ADVICE/BENCH_rN/CORRECTNESS_rN/LEAKCHECK/COPYCHECK) AFTER the
# builder's closing commit, so they are untracked at judge time unless
# the NEXT round tracks them first. Run this as the first action of a
# round; it stages every driver artifact and commits iff anything is
# new or changed. Idempotent: a clean tree commits nothing.
set -e
cd "$(dirname "$0")/.."
git add -f VERDICT.md ADVICE.md LEAKCHECK.json COPYCHECK.json \
  BENCH_r*.json CORRECTNESS_r*.json PROGRESS.jsonl 2>/dev/null || true
if git diff --cached --quiet; then
  echo "round_open: driver artifacts already tracked, nothing to commit"
else
  git commit -m "round open: track driver artifacts from previous round"
fi
