#!/bin/bash
# Reference-CLI-compatible entry (`scripts/download_first_stages.sh`):
# materializes models/first_stage_models/* (config.yaml + model.ckpt when a
# checkpoint is present in the local cache — this deployment has no network
# egress, so there is no wget; see scripts/fetch_models.py).
cd "$(dirname "$0")/.."
exec python scripts/fetch_models.py --group first_stages "$@"
