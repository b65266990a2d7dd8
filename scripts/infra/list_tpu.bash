#!/bin/bash
# List TPU nodes + queued resources (reference scripts/infra/list_tpu.bash).
ZONE="${1:-us-central2-b}"
echo "== nodes =="
gcloud compute tpus tpu-vm list --zone "$ZONE"
echo "== queued resources =="
gcloud compute tpus queued-resources list --zone "$ZONE"
