#!/bin/bash
# Reference-CLI-compatible entry (`scripts/download_models.sh`): materializes
# models/ldm/* (config.yaml + model.ckpt when a checkpoint is present in the
# local cache — this deployment has no network egress, so there is no wget;
# see scripts/fetch_models.py).
cd "$(dirname "$0")/.."
exec python scripts/fetch_models.py --group ldm "$@"
