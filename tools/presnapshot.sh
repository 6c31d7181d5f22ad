#!/usr/bin/env bash
# Pre-snapshot gate: run before ANY end-of-round (or milestone) commit.
#
# Round 4 shipped code and docs out of sync because the snapshot commit
# was made without running the test suite (DocCountsSpec existed and would
# have caught it). This script IS the ritual: full sbt test — which
# includes DocCountsSpec asserting every published count (README tests /
# queries / heavy tier, SURVEY oracle-checked, BENCHNOTES coverage)
# against its single source of truth in the code.
#
# Usage: tools/presnapshot.sh   (exits non-zero on any failure)
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch test
echo "presnapshot: OK — safe to commit"
