#!/bin/bash
# parity: scripts/entrypoint.sh — chown outputs + drop privileges.
# BOA_WARMUP_ON_BOOT=1 additionally pre-compiles the serving programs for
# the bucketed study shapes before the worker accepts tasks (stamped: the
# bake runs once per cache volume; see boa_tpu/serve/warmup.py).
set -e
if [ "${BOA_WARMUP_ON_BOOT:-0}" = "1" ]; then
  # BOA_WARMUP_FULL=1 also bakes the non-fast (full-res ensemble + 5-fold
  # BCA) programs — much longer, for deployments serving non-fast studies
  WARMUP_FLAGS=""
  [ "${BOA_WARMUP_FULL:-0}" = "1" ] && WARMUP_FLAGS="--full"
  python -m boa_tpu.serve.warmup --bake $WARMUP_FLAGS \
    --stamp "${BOA_WARMUP_STAMP:-$HOME/.boa_tpu/warmup.stamp}" || true
fi
if [ -d /storage_directory ] && [ -n "$DOCKER_USER" ]; then
  chown -R "$DOCKER_USER" /storage_directory || true
  exec gosu "$DOCKER_USER" "$@"
fi
exec "$@"
