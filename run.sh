#!/usr/bin/env bash
# SOTA evaluation recipe — the reference run.sh equivalent: evaluates the
# FOMAML* EfficientLab-6-3 checkpoint on all 240 FSS-1000 meta-test tasks
# (2 eval samples, 5 support / 5 query shots, 59 adaptation steps).

data_dir=${DATA_DIR:-fewshot_shards/}
checkpoint_dir=${CHECKPOINT_DIR:-EfficientLab-6-3_FOMAML-star_checkpoint}

python -m mliis_tpu.cli.run_metasegnet --fss_1000 --image_size 224 \
    --pretrained \
    --rsd 2 4 --l2 \
    --foml --foml-tail 5 \
    --final_layer_dropout_rate 0.5 --augment --aug_rate 0.5 \
    --sgd --loss_name bce_dice --inner-batch 8 --learning-rate 0.0005 \
    --train-shots 10 --inner-iters 59 --learning_rate_scheduler fixed \
    --meta-iters 50000 --meta-batch 5 \
    --eval-interval 500 --serially_eval_all_test_tasks --eval-samples 2 \
    --shots 5 --eval-batch 8 --eval-iters 59 --transductive \
    --model_name efficientlab --meta-step 0.1 --meta-step-final 0.00001 \
    --chain_tasks --chain_eval_chunk --task_chunk_size 8 \
    --checkpoint "${checkpoint_dir}" --data-dir "${data_dir}" "$@"
