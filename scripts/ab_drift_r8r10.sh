#!/usr/bin/env bash
# Round-10 ask #3: adjudicate the r9 documents-cluster drift.
# Runs the SAME queries through graft.Bench (warmup + median-of-3, the
# driver's own harness and cpu count) at r8 HEAD (b8b9439, via a git
# worktree) and at the current HEAD, back to back on one quiet machine —
# a code-to-code A/B that separates real regressions from container
# drift. Results land in /tmp/ab_r8.json and /tmp/ab_r10.json.
set -euo pipefail
cd "$(dirname "$0")/.."

QUERIES="dd17_corpus_funnel,dd7_lang_id,dd8_doc_fingerprint,dd9_tfidf,ir8_query_likelihood,dd16_repetition,dd33_ngram_novelty,dd15_decontaminate,dd31_substring_dedup,dd47_vocab_oov"
R8=b8b9439
WT=/tmp/graft-r8-worktree

if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$R8"
fi

echo "== building + running r8 HEAD bench (${R8})"
(cd "$WT" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"' > /tmp/ab_r8.json)

echo "== running current HEAD bench"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  sbt -batch "runMain graft.Bench" 2>/dev/null \
  | grep '"metric"' > /tmp/ab_r10.json

echo "== A/B results"
python3 - << 'EOF'
import json
r8 = json.load(open("/tmp/ab_r8.json"))["queries"]
r10 = json.load(open("/tmp/ab_r10.json"))["queries"]
print(f"{'query':32s} {'r8':>8s} {'r10':>8s} {'ratio':>6s}")
for q in sorted(r8):
    a, b = r8[q], r10.get(q, float('nan'))
    print(f"{q:32s} {a:8.3f} {b:8.3f} {b/a:6.2f}")
EOF
