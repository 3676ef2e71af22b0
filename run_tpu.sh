#!/usr/bin/env bash
# TPU launcher — the reference ships a SLURM/torchrun wrapper whose NCCL and
# torchrun lines target code that doesn't exist (run_montecarlo.sh, SURVEY
# §2 row 17); this is the working TPU-native equivalent.
#
# Single host:           ./run_tpu.sh [--config config.yaml] [--outdir out]
# Multi-host TPU pod:    run this same script on every worker of the pod
#   (e.g. `gcloud compute tpus tpu-vm ssh $TPU --worker=all -- .../run_tpu.sh`);
#   JAX discovers the pod topology from the TPU runtime metadata and
#   jax.distributed wires DCN automatically for multi-host meshes.
set -euo pipefail
cd "$(dirname "$0")"

export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
mkdir -p "$JAX_COMPILATION_CACHE_DIR"

exec python -m mcqueens.cli.experiments --mesh "$@"
