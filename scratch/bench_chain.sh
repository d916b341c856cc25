#!/bin/bash
# Sequential TPU measurements (each recompiles through the tunnel).
cd /root/repo
echo "=== bench n=128 default ===" 
timeout 1200 python bench.py 2>&1
echo "=== bench n=4096 chunk=128 ==="
BENCH_N=4096 timeout 1800 python bench.py 2>&1
echo "=== bench n=4096 chunk=256 ==="
BENCH_N=4096 SIPP_MILLER_CHUNK=256 timeout 1800 python bench.py 2>&1
echo "=== done ==="
