#!/bin/bash
# Test runner: force hermetic CPU JAX and skip the sitecustomize TPU-relay
# registration (must happen BEFORE the interpreter starts — conftest is too
# late for sitecustomize). Only one python process should run at a time on
# this host; the TPU claim serializes otherwise.
cd "$(dirname "$0")"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
exec python -m pytest tests/ "$@"
