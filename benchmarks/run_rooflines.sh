#!/bin/bash
# Regenerate every DESIGN §9/§9a/§9b roofline artifact on the TPU, strictly
# serially (the axon tunnel wedges if two clients touch it — r4 lesson).
# Usage: bash benchmarks/run_rooflines.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/rooflines}
mkdir -p "$OUT"

run() {  # run <name> <env...> -- <cmd...>
  local name=$1; shift
  echo "=== $name"
  env "$@" > "$OUT/$name.json" 2> "$OUT/$name.log"
  tail -c 400 "$OUT/$name.json"; echo
}

run wb        MFU_DUMP_HLO="$OUT/wb_hlo.txt" python benchmarks/mfu_whitebox.py
run fusion    MP_PROGRAM=fusion_pgd MP_DUMP_HLO="$OUT/fp_hlo.txt" python benchmarks/mfu_programs.py
run patch     MP_PROGRAM=patch MP_DUMP_HLO="$OUT/patch_hlo.txt" python benchmarks/mfu_programs.py
run wpconv    python benchmarks/wp_conv_bench.py
run fusion_remat MP_PROGRAM=fusion_pgd MP_REMAT=1 python benchmarks/mfu_programs.py
run fusion_bf16  MP_PROGRAM=fusion_pgd MP_BF16_PARAMS=1 python benchmarks/mfu_programs.py
run patch_remat  MP_PROGRAM=patch MP_REMAT=1 python benchmarks/mfu_programs.py
run patch_bf16   MP_PROGRAM=patch MP_BF16_PARAMS=1 python benchmarks/mfu_programs.py
# width-packed Pallas tail convs as an end-to-end lever (DESIGN 9b)
run wb_wp     TPUFUSION_WP_TAIL=1 python benchmarks/mfu_whitebox.py
run fusion_wp TPUFUSION_WP_TAIL=1 MP_PROGRAM=fusion_pgd python benchmarks/mfu_programs.py
# fused Pallas Adam pixel update as an end-to-end lever (DESIGN 9, r5)
run wb_fa     TPUFUSION_FUSED_ADAM=1 python benchmarks/mfu_whitebox.py
run wb_wp_fa  TPUFUSION_WP_TAIL=1 TPUFUSION_FUSED_ADAM=1 python benchmarks/mfu_whitebox.py
echo "all artifacts in $OUT"
