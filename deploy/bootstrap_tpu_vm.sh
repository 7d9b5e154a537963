#!/usr/bin/env bash
# TPU-VM bootstrap — the reference's scripts/bootstrap_gcp.sh +
# setup_dev_env.sh re-targeted at a TPU VM (no Vertex, no GKE: one VM runs
# the whole pipeline; see deploy/README.md for the resource mapping).
#
#   gcloud compute tpus tpu-vm create plotpointe-v5e --zone=$ZONE \
#     --accelerator-type=v5litepod-1 --version=v2-alpha-tpuv5-lite
#   gcloud compute tpus tpu-vm ssh plotpointe-v5e --zone=$ZONE \
#     --command="$(cat deploy/bootstrap_tpu_vm.sh)"
set -euo pipefail

REPO_URL=${REPO_URL:-}
WORKDIR=${WORKDIR:-$HOME/plotpointe_tpu}
ARTIFACTS=${ARTIFACTS:-$HOME/artifacts}

log() { echo "[bootstrap] $*"; }

log "installing runtime deps"
pip install --quiet --upgrade 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install --quiet numpy pandas pyarrow optax

if [ -n "$REPO_URL" ] && [ ! -d "$WORKDIR" ]; then
  log "cloning $REPO_URL"
  git clone "$REPO_URL" "$WORKDIR"
fi
cd "$WORKDIR"
export PYTHONPATH="$WORKDIR"

# local artifact store (the artifacts GCS bucket analog; set
# PLOTPOINTE_ARTIFACTS=gs://... instead to keep using a bucket)
mkdir -p "$ARTIFACTS"/{staging,embeddings,graphs,models,exports,telemetry}

log "device smoke test (reference: scripts/vertex_smoke_test.sh)"
python -m plotpointe_tpu.cli smoke-tpu

log "done — run the pipeline with:"
echo "  python -m plotpointe_tpu.cli pipeline --workdir $ARTIFACTS --parallel"
echo "  python -m plotpointe_tpu.cli serve --stdlib --port 8080"
