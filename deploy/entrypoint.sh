#!/bin/bash
# parity: scripts/entrypoint.sh — chown outputs + drop privileges.
# BOA_WARMUP_ON_BOOT=1 additionally pre-compiles the serving programs for
# the bucketed study shapes before the worker accepts tasks (stamped: the
# bake runs once per cache volume; see boa_tpu/serve/warmup.py).
set -e
if [ "${BOA_WARMUP_ON_BOOT:-0}" = "1" ]; then
  python -m boa_tpu.serve.warmup --bake \
    --stamp "${BOA_WARMUP_STAMP:-$HOME/.boa_tpu/warmup.stamp}" || true
fi
if [ -d /storage_directory ] && [ -n "$DOCKER_USER" ]; then
  chown -R "$DOCKER_USER" /storage_directory || true
  exec gosu "$DOCKER_USER" "$@"
fi
exec "$@"
