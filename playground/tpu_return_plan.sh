#!/bin/sh
# Run queue for when the axon tunnel comes back (round-2, 2026-08-17 outage).
# Usage: sh playground/tpu_return_plan.sh 2>&1 | tee /tmp/tpu_return.log
set -x
export PYTHONPATH=/root/.axon_site:/root/repo

# 0. kernel equality gates (must pass before any timing)
timeout 900 python -m basedet_tpu.tools.tpu_checks || exit 1

# 1. stride-2 dgrad A/B (decides the S2Conv default)
timeout 1800 python playground/conv_eff.py dgrad

# 2. maxpool bwd probe (select-and-scatter cost)
timeout 900 python playground/conv_eff.py maxpool

# 3. YOLOX-S b128 A/B: subpix stride-2 dgrad vs default
timeout 1800 python playground/yolox_remat_bench.py 128 none
BASEDET_S2_DGRAD=subpix timeout 1800 python playground/yolox_remat_bench.py 128 none

# 3b. maxpool bwd A/B in a RetinaNet-ish trunk context
BASEDET_MAXPOOL_BWD=subpix timeout 1200 python -m basedet_tpu.tools.benchmark --models RetinaNet --modes train --amp
timeout 1200 python -m basedet_tpu.tools.benchmark --models RetinaNet --modes train --amp

# 4. per-stage YOLOX block decomposition (queued timing)
timeout 1800 python playground/ablate_yolox_blocks.py

# 5. iou_pallas evidence A/B (VERDICT r2 weak #5: claim needs an artifact)
timeout 900 python playground/probe_iou_pallas.py

# 6. space-to-depth packed s2-conv A/B (round-3 MXU-utilization lever)
timeout 1800 python playground/conv_eff.py pack
