#!/usr/bin/env bash
# Code-attribution A/B bench: full sweeps of HEAD vs a baseline ref,
# BACK-TO-BACK on the same box and the same data, so artifact drift
# (machine window, driver-regenerated testdata) can't masquerade as a
# code regression. Round 12 settled its 1.06x cross-round artifact
# drift exactly this way (tools/bench_ab_r12.txt: HEAD 0.936x on fixed
# data); this script makes the next drift question a command instead
# of an archaeology project.
#
# Usage: tools/bench_ab.sh <baseline-ref> [sfDir] [passes]
#   baseline-ref  git ref of the comparison code (e.g. a round tag/sha)
#   sfDir         data dir both sweeps read (default /root/testdata/sf0.1)
#   passes        bench passes per sweep (default 3; Bench reports medians)
#
# The baseline checks out into a scratch worktree (removed on exit);
# each sweep is graft.Bench's own refuse-on-load / refuse-on-error run,
# so a contaminated or partial sweep aborts the A/B rather than
# recording a bad comparison. Output format matches bench_ab_r12.txt.
set -euo pipefail
BASE_REF="${1:?usage: tools/bench_ab.sh <baseline-ref> [sfDir] [passes]}"
SF_DIR="${2:-/root/testdata/sf0.1}"
PASSES="${3:-3}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WT="$(mktemp -d /tmp/graft_ab_XXXXXX)"
trap 'git -C "$REPO" worktree remove --force "$WT" >/dev/null 2>&1 || true; rm -rf "$WT"' EXIT
git -C "$REPO" worktree add --detach "$WT" "$BASE_REF" >/dev/null

run_bench() { # $1 = checkout dir, $2 = tag
  # SYMMETRIC warm-up: one discarded media-only pass per checkout, so a
  # baseline ref that predates Bench's own in-process page-cache warm-up
  # starts from the same cache state as HEAD (r13 ADVICE: without this,
  # HEAD's media queries got an artificial 0.75-3.7s edge at passes<=2
  # against pre-warm-up refs). Failures are ignored — an old Bench that
  # errors on the restricted sweep still got its JVM+cache touch.
  (cd "$1" &&
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_PASSES=1 \
    SPARK_GRAFT_BENCH_ONLY="q35_media_meta,q36_media_features,q56_media_decode,q58_audio_decode" \
      sbt -batch "runMain graft.Bench" >/dev/null 2>&1) || true
  # SYMMETRIC drain: the warm-up pass itself leaves a ~1.4 one-minute
  # loadavg, under graft.Bench's 1.5 refuse threshold but enough to
  # tax the sweep's opening queries. The two sides used to see it
  # ASYMMETRICALLY — head sweeps right after its warm-up, while base's
  # sbt compile of the fresh worktree acts as a multi-minute cool-down
  # (r16 measured head loadavg_start 1.38 vs base 0.61, a ~9% median
  # inflation on head's early sub-second queries). Wait both sides
  # down to the same near-idle start.
  for _ in $(seq 1 20); do
    LOAD1="$(cut -d' ' -f1 /proc/loadavg)"
    awk "BEGIN{exit !($LOAD1 < 0.5)}" && break
    echo "# draining load $LOAD1 before $2 sweep..." >&2
    sleep 30
  done
  # the drain falling through hot would contaminate one side silently;
  # say so LOUDLY (the sweep sidecar also records loadavg_start, so the
  # contamination is auditable after the fact)
  LOAD1="$(cut -d' ' -f1 /proc/loadavg)"
  awk "BEGIN{exit !($LOAD1 >= 0.5)}" &&
    echo "# WARNING: drain TIMED OUT at loadavg $LOAD1 — the $2 sweep starts contaminated" >&2
  echo "# sweeping $2 ($1, sha $(git -C "$1" rev-parse --short HEAD))..." >&2
  (cd "$1" &&
    SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_PASSES="$PASSES" \
      sbt -batch "runMain graft.Bench" >"/tmp/graft_ab_$2.log" 2>&1) || {
    echo "bench FAILED or refused for $2 — tail of /tmp/graft_ab_$2.log:" >&2
    tail -5 "/tmp/graft_ab_$2.log" >&2
    exit 1
  }
  cp "$1/bench_last.json" "/tmp/graft_ab_$2.json"
}

echo "# A/B: HEAD vs $BASE_REF on $SF_DIR, $PASSES passes each, back-to-back" >&2
run_bench "$REPO" head
run_bench "$WT" base

# exact code identity of both sides, stamped into the headline: a
# reader of the committed JSON must not have to guess which commits
# the ratio compares
HEAD_SHA="$(git -C "$REPO" rev-parse --short HEAD)"
BASE_SHA="$(git -C "$WT" rev-parse --short HEAD)"
export HEAD_SHA BASE_SHA

python3 - "$BASE_REF" "$SF_DIR" "$REPO" <<'EOF'
import json, sys, statistics
head = json.load(open('/tmp/graft_ab_head.json'))
base = json.load(open('/tmp/graft_ab_base.json'))
hq, bq = head['queries'], base['queries']
shared = [q for q in hq if q in bq and hq[q] > 0 and bq[q] > 0]
print(f"# Code-attribution A/B: full {sys.argv[2]} bench sweeps BACK-TO-BACK, same box, same data")
print(f"# head loadavg_start={head['loadavg_start']} passes={head['passes']}; "
      f"base({sys.argv[1]}) loadavg_start={base['loadavg_start']} passes={base['passes']}")
ratios = sorted(hq[q] / bq[q] for q in shared)
th = sum(hq[q] for q in shared)
tb = sum(bq[q] for q in shared)
print(f"# TOTALS: head={th:.1f}s  base={tb:.1f}s  ratio={th/tb:.3f}  "
      f"median per-query ratio={statistics.median(ratios):.3f}")
# committed headline: graft.Bench embeds this file into its JSON line
# ("ab" field), so the official BENCH artifact carries the
# load-controlled comparison instead of needing post-hoc acquittal
with open(f"{sys.argv[3]}/tools/ab_headline.json", "w") as f:
    import os
    json.dump({"base_ref": sys.argv[1], "sf": sys.argv[2],
               "head_sha": os.environ.get("HEAD_SHA", "?"),
               "base_sha": os.environ.get("BASE_SHA", "?"),
               "head_loadavg_start": head['loadavg_start'],
               "base_loadavg_start": base['loadavg_start'],
               "shared_queries": len(shared),
               "head_total_s": round(th, 1), "base_total_s": round(tb, 1),
               "ratio": round(th / tb, 3),
               "median_ratio": round(statistics.median(ratios), 3)}, f)
    f.write("\n")
movers = [q for q in shared if hq[q] / bq[q] > 1.25]
if movers:
    print(f"# >1.25x movers: {', '.join(movers)} — check queries_passes in "
          f"/tmp/graft_ab_*.json for bimodality before calling it a regression")
print(f"{'query':<38}{'head':>9}{'base':>9}  ratio")
for q in shared:
    print(f"{q:<38}{hq[q]:>9.3f}{bq[q]:>9.3f}  {hq[q]/bq[q]:6.2f}")
EOF
