#!/bin/bash
# Round-5 evidence sweep (VERDICT r4 asks #3, #4, #6, #7): runs every
# kernel bench on the real TPU with the earned library defaults, plus
# the explicit xla-vs-pallas NTT and eval comparisons, appending rows
# (each with a check bit) to bench/results.jsonl.
# TPU compiles land in a dedicated cache dir so build_cache_seed.py can
# label them backend=tpu for the committed seed.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/tpu_cache}
mkdir -p "$JAX_COMPILATION_CACHE_DIR"
LOG=${LOG:-/tmp/r5_evidence.log}

run() {  # run <timeout_s> [NAME=val ...] -- <bench/run.py args ...>
  local t="$1"; shift
  local envs=()
  while [[ "$1" == *=* ]]; do envs+=("$1"); shift; done
  [[ "$1" == "--" ]] && shift
  env "${envs[@]}" timeout "$t" python bench/run.py "$@" >> "$LOG" 2>&1
  echo "rc=$? [${envs[*]}] $*" >> "$LOG"
}

# eval: earned pallas default vs explicit xla (ask #3)
run 900 -- --kernels eval
run 900 TPUKZG_EVAL_IMPL=xla -- --kernels eval

# ntt: xla vs pallas at 4096; 2^18 falls back to xla inside the pallas
# guard (128 <= n <= 8192), run anyway to confirm the fallback (ask #6)
run 900 -- --kernels ntt --n 4096
run 900 TPUKZG_NTT_IMPL=pallas -- --kernels ntt --n 4096
run 900 -- --kernels ntt --n 262144

# micro-kernel evidence rows (ask #7)
run 900 -- --kernels ecadd,montmul,montmul_pallas
run 1200 -- --kernels pairing

echo "DONE-PHASE1" >> "$LOG"

# configs 3+4 with earned kernels + check bits (ask #4) — the long ones
run 1800 -- --kernels msm --n 1048576
run 1800 -- --kernels pipeline
echo "DONE-ALL" >> "$LOG"
