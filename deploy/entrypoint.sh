#!/bin/bash
# parity: scripts/entrypoint.sh — chown outputs + drop privileges
set -e
if [ -d /storage_directory ] && [ -n "$DOCKER_USER" ]; then
  chown -R "$DOCKER_USER" /storage_directory || true
  exec gosu "$DOCKER_USER" "$@"
fi
exec "$@"
