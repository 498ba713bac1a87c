#!/bin/bash
# Batch B': disclosed-window fallback (the r15 Table-7 precedent) — scan
# gate certifies the window, the shuffle pair is recorded as disclosure.
cd /root/repo
cert=0
for i in 1 2 3 4 5 6 7 8 9 10; do
  python scripts/record_quiet_bars.py --family scan \
    text_quality_classifier text_classifier_holdout_eval agg_theil_index \
    text_bpe_apply text_bpe_pack_sequences sample_shuffle_global \
    agg_weighted_percentile graph_label_propagation agg_gini_grouped \
    > /root/repo/.bars_r16/B2_$i.json 2> /root/repo/.bars_r16/B2_$i.err
  if [ $? -eq 0 ]; then cert=$((cert+1)); fi
  if [ $cert -ge 2 ]; then break; fi
  sleep 150
done
echo "done certified=$cert" > /root/repo/.bars_r16/B2_done
