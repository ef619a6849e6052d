#!/bin/bash
# Regenerate the surface counts in README.md and the verify skill
# (r13 verdict item 5: counts drifted by hand four rounds running —
# so now they are written by machine, from the same sources the driver
# checks).
#
# Usage:
#   scripts/update_counts.sh [TEST_COUNT]
#
# Query counts come from `runMain graft.SurfaceCounts` (the literal
# SparkEntry.queries map). TEST_COUNT is the "Total number of tests
# run" figure from the most recent `sbt test`; pass it to avoid the
# ~6 min re-run, or omit it to have this script run the suite itself.
set -euo pipefail
cd "$(dirname "$0")/.."

# `|| true` keeps the guards below LIVE: under set -euo pipefail a
# no-match grep would otherwise kill the script before the diagnostic.
COUNTS=$(sbt -batch "runMain graft.SurfaceCounts" 2>/dev/null \
  | grep -oE '(queries|max_query_id)=[0-9]+' || true)
Q=$(echo "$COUNTS" | grep '^queries='      | cut -d= -f2 || true)
MAXQ=$(echo "$COUNTS" | grep '^max_query_id=' | cut -d= -f2 || true)
# A garbled sbt line must not stamp empty counts into the docs — the
# whole point of this script is preventing count corruption.
if [ -z "$Q" ] || [ -z "$MAXQ" ]; then
  echo "ERROR: could not extract counts (queries='$Q' max='$MAXQ')" >&2
  exit 1
fi

T="${1:-}"
if [ -z "$T" ]; then
  echo "No test count supplied — running sbt test (~6 min)..." >&2
  T=$(sbt -batch test 2>&1 \
    | grep -oE 'Total number of tests run: [0-9]+' | tail -1 \
    | grep -oE '[0-9]+' || true)
fi
if [ -z "$T" ]; then
  echo "ERROR: could not determine the test count" >&2
  exit 1
fi

python3 - "$Q" "$MAXQ" "$T" <<'EOF'
import re, sys
q, maxq, t = sys.argv[1], sys.argv[2], sys.argv[3]

# Substitutions are LINE-ANCHORED (ADVICE r14): each count pattern is
# rewritten only on lines matching its anchor, so prose mentioning a
# HISTORICAL count ("retired from the 244-queries era") is never
# clobbered by a file-wide numeric regex. Every rule must fire at
# least once — an anchor that stops matching (doc reworded) fails the
# run loudly instead of leaving a silently stale count. Validation of
# ALL files happens before ANY write, so a failed anchor can never
# leave the docs half-updated (README new, SKILL.md stale — the exact
# cross-file drift this script exists to prevent).
def rewrite(path, rules):
    lines = open(path).read().split('\n')
    fired = {i: 0 for i in range(len(rules))}
    out = []
    for line in lines:
        for i, (anchor, pat, rep) in enumerate(rules):
            if re.search(anchor, line):
                line, n = re.subn(pat, rep, line)
                fired[i] += n
        out.append(line)
    missing = [rules[i][0] for i, n in fired.items() if n == 0]
    if missing:
        sys.exit(f"ERROR: {path}: no line matched anchor(s) {missing} "
                 "— doc reworded? fix the anchors in update_counts.sh")
    return '\n'.join(out)

pending = [(path, rewrite(path, rules)) for path, rules in [
    ('README.md', [
        (r'ids reach q', r'\b\d+ queries', f'{q} queries'),
        (r'ids reach q', r'ids reach q\d+', f'ids reach q{maxq}'),
        (r'bench runs in', r'\b\d+ queries', f'{q} queries'),
        (r'ScalaTest checks', r'\b\d+ ScalaTest checks',
         f'{t} ScalaTest checks'),
    ]),
    ('.claude/skills/verify/SKILL.md', [
        (r'pass, 0 fail', r'N = \d+', f'N = {q}'),
        (r'-query surface', r'\b\d+-query surface', f'{q}-query surface'),
        (r'sbt test', r'\b\d+ checks', f'{t} checks'),
        (r'lands at', r'\b\d+ queries', f'{q} queries'),
    ]),
]]
for path, content in pending:
    open(path, 'w').write(content)
print(f'counts written: queries={q} max_id=q{maxq} tests={t}')
EOF
