#!/bin/bash
# Round-5 TPU measurement campaign: ONE process at a time, sequential,
# quiet host assumed.  Logs under /tmp/r5logs/.
set -x
cd /root/repo
L=/tmp/r5logs

timeout 5400 python tools/tpu_verify.py --json VERIFY_r05.json \
    > $L/verify.log 2>&1
echo "verify rc=$?"

timeout 2400 python tools/kernel_rates.py > $L/kernel_rates.log 2>&1
echo "kernel_rates rc=$?"

timeout 2400 python tools/ml_ab_probe.py > $L/ml_ab.log 2>&1
echo "ml_ab rc=$?"

timeout 3600 python tools/admm4096_probe.py > $L/admm4096.log 2>&1
echo "admm4096 rc=$?"

timeout 7200 python bench.py --all --out BENCH_ALL_r05.json \
    > $L/bench_all.log 2> $L/bench_all.err
echo "bench rc=$?"
