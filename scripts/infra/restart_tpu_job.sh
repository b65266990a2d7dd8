#!/bin/bash
# Auto-restart loop for preempted/best-effort TPU jobs (reference
# scripts/infra/restart_tpu_job.sh): poll the node state; when it drops out
# of READY, re-create the queued resource and relaunch the training command
# (training resumes from the latest Orbax checkpoint via --train_continue).

NAME="${1:?tpu name}"
ZONE="${2:-us-central2-b}"
TRAIN_CMD="${3:?training command to (re)launch}"

while true; do
    STATE=$(gcloud compute tpus tpu-vm describe "$NAME" --zone "$ZONE" \
        --format='value(state)' 2>/dev/null || echo "MISSING")
    echo "$(date -Is) state=$STATE"
    case "$STATE" in
        READY)
            # ensure the job is running; relaunch if the tmux session died
            if ! gcloud compute tpus tpu-vm ssh "$NAME" --zone "$ZONE" \
                    --worker=0 --command "tmux has-session -t train" 2>/dev/null; then
                echo "relaunching training (resume from latest checkpoint)"
                gcloud compute tpus tpu-vm ssh "$NAME" --zone "$ZONE" \
                    --worker=all \
                    --command "tmux new-session -d -s train '$TRAIN_CMD --train_continue True'"
            fi
            ;;
        MISSING|PREEMPTED|TERMINATED)
            echo "re-creating $NAME"
            bash "$(dirname "$0")/create_cambrian_tpu.sh" "$NAME" || true
            ;;
    esac
    sleep 120
done
