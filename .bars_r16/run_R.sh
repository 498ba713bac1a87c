#!/bin/bash
cd /root/repo
for i in 1 2 3 4 5; do
  python scripts/record_canary_ref.py > /root/repo/.bars_r16/R_$i.json 2> /root/repo/.bars_r16/R_$i.err
  sleep 150
done
echo done > /root/repo/.bars_r16/R_done
