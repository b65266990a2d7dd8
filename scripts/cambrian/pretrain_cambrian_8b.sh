#!/bin/bash
# Stage-1 SVA pretraining, Cambrian-1-8B (LLaMA-3-8B-Instruct base).
# Hyperparameters mirror the reference launch (pretrain_cambrian_8b.sh:10-57):
# lr 1e-3 / SVA lr 1e-4, cosine + 6% warmup, bs 8/device, 4 towers with
# [576,576,576,9216] aux tokens -> 576 latent, 10 in-LLM SVA layers stride 3,
# image_position 91. GSPMD replaces torch_xla FSDP: one process per host,
# mesh (data x fsdp x model) instead of xmp.spawn + wrapper classes.

export CKPT_NAME="cambrian-8b-pretrain"
export GCS_DIR="${GCS_DIR:-}"          # optional gs:// output mirror

python -m cambrian_tpu.train.train \
    --model_name_or_path "${BASE_MODEL:-llama3-8b}" \
    --version llama_3 \
    --data_path "${DATA_PATH:?set DATA_PATH to the alignment jsonl}" \
    --image_folder "${IMAGE_FOLDER:?set IMAGE_FOLDER}" \
    --vision_tower_aux_list '["siglip/CLIP-ViT-SO400M-14-384", "openai/clip-vit-large-patch14-336", "facebook/dinov2-giant-res378", "clip-convnext-XXL-multi-stage"]' \
    --vision_tower_aux_token_len_list '[576, 576, 576, 9216]' \
    --image_token_len 576 \
    --num_query_group 1 \
    --query_num_list '[576]' \
    --connector_depth 3 \
    --connector_only False \
    --num_of_vision_sampler_layers 10 \
    --start_of_vision_sampler_layers 0 \
    --stride_of_vision_sampler_layers 3 \
    --vision_hidden_size 1024 \
    --mm_projector_type sva \
    --mm_vision_select_layer -2 \
    --image_position 91 \
    --model_max_length 2048 \
    --tune_mm_mlp_adapter True \
    --bf16 True \
    --output_dir "./checkpoints/${CKPT_NAME}" \
    --num_train_epochs 1 \
    --per_device_train_batch_size 8 \
    --gradient_accumulation_steps 1 \
    --learning_rate 1e-3 \
    --mm_vision_sampler_lr 1e-4 \
    --weight_decay 0.0 \
    --warmup_ratio 0.06 \
    --lr_scheduler_type cosine \
    --logging_steps 1 \
    --save_steps 500 \
    --save_total_limit 2 \
    --mesh_data 1 --mesh_fsdp -1 --mesh_model 1 \
    --group_by_modality_length True \
    --gcs_output_dir "${GCS_DIR}"
