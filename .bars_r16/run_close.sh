#!/bin/bash
cd /root/repo
python bench.py > /root/repo/.bars_r16/bench.out 2> /root/repo/.bars_r16/bench.err
echo bench_rc=$? >> /root/repo/.bars_r16/close.log
python scripts/plan_audit.py > /root/repo/.bars_r16/plan_audit.out 2>&1
echo plan_audit_rc=$? >> /root/repo/.bars_r16/close.log
python scripts/scan_sweep.py > /root/repo/.bars_r16/scan_sweep.out 2>&1
echo scan_sweep_rc=$? >> /root/repo/.bars_r16/close.log
echo done >> /root/repo/.bars_r16/close.log
