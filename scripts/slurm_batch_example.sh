#!/bin/bash
# Multi-host volume fan-out on SLURM — the reference's .submit.yml / sub/*.sh
# deployment pattern expressed through the framework's batch CLI. Each array
# task processes its shard of the volume directories (the DCN level of the
# mesh design); per-volume artifacts are idempotent, so preempted tasks
# simply resume.
#
#SBATCH --array=0-7
#SBATCH --gres=tpu:1
#SBATCH --job-name=vittf-batch

DATA_ROOT=${1:?usage: slurm_batch_example.sh DATA_ROOT [WEIGHTS]}
WEIGHTS=${2:-}

ARGS=(--root "$DATA_ROOT" --shard "${SLURM_ARRAY_TASK_ID}/${SLURM_ARRAY_TASK_COUNT}")
[ -n "$WEIGHTS" ] && ARGS+=(--weights "$WEIGHTS")

python -m vittf_tpu.cli.batch infer-all "${ARGS[@]}" --feature-output-size 96
python -m vittf_tpu.cli.batch predict-all --root "$DATA_ROOT" \
    --shard "${SLURM_ARRAY_TASK_ID}/${SLURM_ARRAY_TASK_COUNT}" \
    --num-samples 1024 8096
