#!/bin/bash
# TPU pod lifecycle: create via queued resources and bootstrap the repo
# (reference scripts/infra/create_cambrian_tpu.sh semantics, updated for a
# JAX stack: no torch_xla wheel installs, no PD attach needed — data streams
# from GCS via tensorstore/gcsfs).
#
# Usage: bash create_cambrian_tpu.sh NAME ACCELERATOR_TYPE [ZONE] [PROJECT]

set -e
NAME="${1:?tpu name}"
ACCEL="${2:-v5litepod-8}"
ZONE="${3:-us-central2-b}"
PROJECT="${4:-$(gcloud config get-value project)}"
RUNTIME="${RUNTIME:-tpu-ubuntu2204-base}"

gcloud compute tpus queued-resources create "${NAME}-qr" \
    --node-id "$NAME" \
    --project "$PROJECT" \
    --zone "$ZONE" \
    --accelerator-type "$ACCEL" \
    --runtime-version "$RUNTIME" \
    --best-effort

echo "waiting for ${NAME} to become ACTIVE..."
while true; do
    STATE=$(gcloud compute tpus queued-resources describe "${NAME}-qr" \
        --zone "$ZONE" --project "$PROJECT" --format='value(state.state)')
    echo "state: $STATE"
    [[ "$STATE" == "ACTIVE" ]] && break
    [[ "$STATE" == "FAILED" || "$STATE" == "SUSPENDED" ]] && exit 1
    sleep 30
done

# bootstrap every worker
gcloud compute tpus tpu-vm ssh "$NAME" --zone "$ZONE" --project "$PROJECT" \
    --worker=all --command "
        git clone ${REPO_URL:-https://github.com/your-org/cambrian-tpu} ~/cambrian-tpu || true
        pip install -e ~/cambrian-tpu
        pip install -U 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
    "
echo "done. launch training with scripts/infra/launch_pod.sh $NAME <train-script>"
