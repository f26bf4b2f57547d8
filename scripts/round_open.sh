#!/usr/bin/env bash
# Round-open step: the driver writes its round artifacts (VERDICT/ADVICE/
# CORRECTNESS_r{N}/BENCH_r{N}/LEAKCHECK/BENCH_LOCAL re-runs) AFTER the
# builder's last commit, so every round used to open with the previous
# round's evidence dangling uncommitted (flagged in rounds 6 and 7).
# Run this FIRST THING each round: it commits whatever round artifacts
# the driver left behind (modified or untracked, .gitignore respected),
# and nothing else.
set -euo pipefail
cd "$(dirname "$0")/.."

mapfile -t files < <(git status --porcelain -- \
    VERDICT.md ADVICE.md BENCH_LOCAL.json LEAKCHECK.json \
    SCALE_CANARY.json CROSSOVER.json 'BENCH_r*.json' 'CORRECTNESS_r*.json' \
  | awk '{print $2}')

if [ ${#files[@]} -eq 0 ]; then
  echo "round_open: evidence clean, nothing to commit"
  exit 0
fi

git add -- "${files[@]}"
round=$(ls CORRECTNESS_r*.json 2>/dev/null | sed 's/[^0-9]//g' | sort -n | tail -1)
git commit -m "round ${round:-?}: commit driver-written round artifacts" -- "${files[@]}"
echo "round_open: committed ${files[*]}"
