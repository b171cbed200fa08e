#!/bin/bash
# Property-suite soak (VERDICT r15 item 5): the generative
# differentials found real bugs at their default 24-test budgets
# (wildcard-entity fusion r15, duplicate-id fusion r16) — this entry
# point runs them at a deep budget so a round record can include a
# green soak, not just the default-budget battery pass.
#
#   tools/soak.sh [N]          # default 500 tests per property
#
# Writes the summary to SOAK.txt (repo root) and exits non-zero on
# any failure.
set -uo pipefail
N="${1:-500}"
cd "$(dirname "$0")/.."
SUITES=(
  graft.props.DirectNativeProps
  graft.props.EavTypedProps
  graft.props.EavRegroupProps
  graft.props.ShredProps
  graft.props.PrecedenceProps
  graft.props.PureProps
  graft.props.KernelProps
  graft.props.HeteroProps
  graft.props.AnalyticsProps
)
echo "[soak] GRAFT_PROP_N=$N over ${#SUITES[@]} suites" | tee SOAK.txt
GRAFT_PROP_N="$N" sbt -batch "testOnly ${SUITES[*]}" 2>&1 \
  | tee /tmp/graft_soak_full.log \
  | grep -E "OK, passed|Failed|Falsified|Exception|MISMATCH" \
  | tee -a SOAK.txt
code=$(grep -cE "Falsified|Exception raised|MISMATCH" SOAK.txt || true)
passed=$(grep -c "OK, passed" SOAK.txt || true)
echo "[soak] suites green: $passed, failures: $code" | tee -a SOAK.txt
date -u +"[soak] completed %Y-%m-%dT%H:%M:%SZ" | tee -a SOAK.txt
test "$code" -eq 0
