#!/bin/sh
# Session-5 TPU A/B queue (run arms sequentially; ONE process on the
# chip at a time).  Baseline default arm is the new secular 'loop'
# skip; arms probe the remaining warm-solve knobs and re-record the
# north-star config.
set -x
# 1. north-star at the new default
BENCH_NCHAINS=10240 python bench.py
# 2. perturbation-move Newton prepass + narrow ring (the prepass
#    recenters, so the ring only needs to cover the residual shift)
BAYHUNTER_PERT_PREPASS=newton BAYHUNTER_PERT_RING=4 python bench.py
# 3. narrow ring alone (no prepass) for attribution
BAYHUNTER_PERT_RING=8 python bench.py
# 4. tighter dim ring with the newton prepass (default DIM_RING=24)
BAYHUNTER_DIM_RING=12 python bench.py
