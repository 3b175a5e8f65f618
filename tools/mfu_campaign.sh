#!/bin/bash
# Scaled-dims MFU campaign (VERDICT r4 #1): train + sampler throughput at
# M=I=128/256 across backends/precisions/batches on the real chip.
#
# Two-phase protocol for a 1-CPU host with background load: run once to
# pay every compile into /tmp/jax_cache (numbers indicative), then stop
# background work and re-run — all configs hit the persistent cache and
# the timed windows are clean. The xla backend runs LAST and per-config:
# its dims>=128 train-step compile has wedged the remote compile service
# (2026-08-19: >40 min, service unresponsive for ~25 min after), so a
# wedge loses one config, not the campaign.
set -u
cd "$(dirname "$0")/.."

KB=${PMHC_CAMPAIGN_BACKENDS:-pallas_lane,g8}
for DIM in 128 256; do
  for PREC in --bf16 --fast-f32; do
    echo "=== train dims=$DIM prec=$PREC backends=$KB ==="
    timeout "${PMHC_CAMPAIGN_TIMEOUT:-3000}" python -u tools/bench_train.py \
      --batches 64,256,1024,2048 --backends "$KB" \
      --inner-size "$DIM" --message-size "$DIM" "$PREC" 2>&1 | grep -v WARNING
  done
done

for DIM in 128 256; do
  for BS in 256 1024; do
    echo "=== sampler dims=$DIM bf16 batch=$BS ==="
    timeout "${PMHC_CAMPAIGN_TIMEOUT:-3000}" python -u tools/bench_sampler.py \
      --batch-size "$BS" --backends "${PMHC_CAMPAIGN_SAMPLER:-lane_scan,g8_scan}" \
      --bf16 --inner-size "$DIM" --message-size "$DIM" 2>&1 | grep -v WARNING
  done
done
echo "=== campaign done ==="
