#!/usr/bin/env bash
# Pre-warm the persistent XLA compilation cache for the driver's
# dryrun_multichip(8) check.  The six dryrun stages are six full-UNet GSPMD
# CPU compiles (~9 min total on this 1-core host, which tripped the round-3
# driver timeout); a warmed cache replays them in ~1-2 min.
#
# Run after ANY change to model/pipeline code (stale entries are simply
# recompiled — correctness is never affected, only time).
set -u
cd /root/repo
echo "=== [$(date -u +%FT%TZ)] warming dryrun compile cache"
time timeout 1800 python __graft_entry__.py dryrun 8
echo "=== [$(date -u +%FT%TZ)] verifying warm replay"
time timeout 600 python __graft_entry__.py dryrun 8
