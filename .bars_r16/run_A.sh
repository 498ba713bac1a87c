#!/bin/bash
# Batch A: scan-family denominators (dedup_cdc_chunks, ts_periodogram) +
# join_nation_volume_q7 re-record, --family scan gate. Loop until 2
# certified windows or 8 attempts; >=150 s cooldown between attempts.
cd /root/repo
cert=0
for i in 1 2 3 4 5 6 7 8; do
  python scripts/record_quiet_bars.py --family scan \
    dedup_cdc_chunks ts_periodogram join_nation_volume_q7 \
    > /root/repo/.bars_r16/A_$i.json 2> /root/repo/.bars_r16/A_$i.err
  if [ $? -eq 0 ]; then cert=$((cert+1)); fi
  if [ $cert -ge 2 ]; then break; fi
  sleep 150
done
echo "done certified=$cert" > /root/repo/.bars_r16/A_done
