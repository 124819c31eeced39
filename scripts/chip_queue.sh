#!/bin/bash
# The round-4 on-chip measurement queue (the axon tunnel relay died
# mid-round-4; see BASELINE.md "Measured (round 4)" and utils/retry.py).
# Run on a host with a LIVE tunnel; each entry fails fast (bounded probe)
# if the tunnel is down. Results append to /tmp/chip_queue.log.
#
#   bash scripts/chip_queue.sh
set -x
cd "$(dirname "$0")/.."
LOG=/tmp/chip_queue.log
{
  date
  # 1. headline bench (expect >=8044; img_y broadcast fusion may add
  #    ~0.2-0.4 ms/step of the 6.4 -> up to ~8.5k)
  timeout 2400 python bench.py
  # 2. img_y fusion A/B: the pre-fusion form has no knob (it is bit-exact),
  #    so the A/B is bench vs the recorded round-3 8044 baseline.
  # 3. XE batch sweep incl. the remat-unlocked sizes
  VSRCIC_XE_BATCHES=512,1024,2048 timeout 3600 python scripts/bench_xe.py
  #    lean=False comparison at the old sizes (expand-once residuals)
  VSRCIC_XE_LEAN=0 VSRCIC_XE_BATCHES=512 timeout 1800 python scripts/bench_xe.py
  # 4. SCST at 1024 (remat default on; native C++ reward ~50 ms/1024)
  VSRCIC_SCST_BATCH=1024 timeout 3600 python scripts/bench_scst.py
  # 5. pipeline throughput (expect >=3151)
  timeout 3600 python scripts/bench_pipeline.py
  # 6. fast-path metric delta at full scale on the chip
  timeout 5400 python scripts/fastpath_metric_delta.py
  date
} 2>&1 | tee -a "$LOG"
