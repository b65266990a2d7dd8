#!/bin/bash
# Delete SUSPENDED queued resources (reference scripts/infra/delete_suspended.bash).
ZONE="${1:-us-central2-b}"
for QR in $(gcloud compute tpus queued-resources list --zone "$ZONE" \
        --filter='state.state=SUSPENDED' --format='value(name)'); do
    echo "deleting $QR"
    gcloud compute tpus queued-resources delete "$QR" --zone "$ZONE" --quiet
done
