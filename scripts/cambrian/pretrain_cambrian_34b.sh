#!/bin/bash
# Stage-1, Cambrian-1-34B (Hermes-2-Yi-34B base): global bs 1024
# (README.md:236). Hyperparams follow
# /root/reference/scripts/cambrian/pretrain_cambrian_34b.sh: chatml_direct,
# image_position 87, 9 in-LLM sampler layers stride 7. 34B needs tensor
# parallelism on small slices (SURVEY.md §7 hard-part 7): mesh_model 4 puts
# TP on the innermost ICI axis; fsdp absorbs the rest.

python -m cambrian_tpu.train.train \
    --model_name_or_path "${BASE_MODEL:-yi-34b}" \
    --version chatml_direct \
    --data_path "${DATA_PATH:?}" \
    --image_folder "${IMAGE_FOLDER:?}" \
    --vision_tower_aux_list '["siglip/CLIP-ViT-SO400M-14-384", "openai/clip-vit-large-patch14-336", "facebook/dinov2-giant-res378", "clip-convnext-XXL-multi-stage"]' \
    --vision_tower_aux_token_len_list '[576, 576, 576, 9216]' \
    --image_token_len 576 --num_query_group 1 --query_num_list '[576]' \
    --connector_depth 3 --num_of_vision_sampler_layers 9 \
    --start_of_vision_sampler_layers 0 \
    --stride_of_vision_sampler_layers 7 --vision_hidden_size 1024 \
    --mm_projector_type sva --image_position 87 --model_max_length 2048 \
    --tune_mm_mlp_adapter True --bf16 True \
    --output_dir ./checkpoints/cambrian-34b-pretrain \
    --num_train_epochs 1 --per_device_train_batch_size 4 \
    --learning_rate 1e-3 --mm_vision_sampler_lr 1e-4 \
    --warmup_ratio 0.06 --lr_scheduler_type cosine \
    --logging_steps 1 --save_steps 250 \
    --mesh_data 1 --mesh_fsdp -1 --mesh_model 4 \
    --group_by_modality_length True
