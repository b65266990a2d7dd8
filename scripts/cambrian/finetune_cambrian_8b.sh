#!/bin/bash
# Stage-2 SFT, Cambrian-1-8B: unfreeze the decoder, lr 4e-5
# (reference README.md:240-244; LR scaling rule :249 — halve lr when global
# batch halves).
#
# v5e-8 memory geometry (r4 TPU buffer assignment, docs/PERF_NOTES.md):
# bs 8/device does NOT fit a full finetune on 16 GB chips — per-device batch
# drops to 2 with 4x grad accumulation (same global 64 per optimizer step)
# and the first Adam moment is stored bf16. On v4/v5p (32/95 GB HBM) or
# larger v5e slices, raise per_device_train_batch_size back up.

export CKPT_NAME="cambrian-8b-finetune"

python -m cambrian_tpu.train.train \
    --model_name_or_path "${PRETRAIN_CKPT:?set PRETRAIN_CKPT to the stage-1 output dir}" \
    --version llama_3 \
    --data_path "${DATA_PATH:?set DATA_PATH to Cambrian7M jsonl}" \
    --image_folder "${IMAGE_FOLDER:?set IMAGE_FOLDER}" \
    --vision_tower_aux_list '["siglip/CLIP-ViT-SO400M-14-384", "openai/clip-vit-large-patch14-336", "facebook/dinov2-giant-res378", "clip-convnext-XXL-multi-stage"]' \
    --vision_tower_aux_token_len_list '[576, 576, 576, 9216]' \
    --image_token_len 576 \
    --num_query_group 1 \
    --query_num_list '[576]' \
    --connector_depth 3 \
    --connector_only False \
    --num_of_vision_sampler_layers 10 \
    --stride_of_vision_sampler_layers 3 \
    --vision_hidden_size 1024 \
    --mm_projector_type sva \
    --image_position 91 \
    --model_max_length 2048 \
    --tune_mm_mlp_adapter False \
    --bf16 True \
    --output_dir "./checkpoints/${CKPT_NAME}" \
    --num_train_epochs 1 \
    --per_device_train_batch_size 2 \
    --gradient_accumulation_steps 4 \
    --adam_mu_dtype bfloat16 \
    --learning_rate 4e-5 \
    --mm_vision_sampler_lr 1e-5 \
    --warmup_ratio 0.03 \
    --lr_scheduler_type cosine \
    --logging_steps 10 \
    --save_steps 1000 \
    --mesh_data 1 --mesh_fsdp -1 --mesh_model 1 \
    --group_by_modality_length True
