#!/bin/bash
# Between-rounds sleeper (launched ~00:00 UTC Aug-19, end of the round-4
# continuation session): wait until the driver's round-end bench +
# multichip dryrun are safely done, then relaunch bin/r4_queue.sh — its
# skip-if-exists logic resumes exactly at the first unfinished cell
# (gmm_dis_lv_seed3, aladip_vacuum_dis, funnel_dis_lv_traj, mw/dw
# estimator columns, stragglers, cox/nice gated by remaining budget).
# Survives only if the VM doesn't reboot again; harvests are committed
# per-cell by r4_queue.sh itself, so anything it finishes is durable.
# Usage: bash bin/r4_sleeper.sh 'YYYY-MM-DD HH:MM'(wake) 'YYYY-MM-DD HH:MM'(hard stop)
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
echo $$ > logs/r4_sleeper.pid

WAKE=$(date -ud "${1:?WAKE required}" +%s)
HARD_STOP="${2:?HARD_STOP required}"

while [ "$(date -u +%s)" -lt "$WAKE" ]; do sleep 60; done
echo "[sleeper] waking $(date -u +%H:%M:%S), launching r4_queue HARD_STOP=$HARD_STOP"
exec bash bin/r4_queue.sh "$HARD_STOP"
