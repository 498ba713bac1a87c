#!/bin/bash
# Batch B: shuffle-family denominators under the STRICT shuffle gate
# (first time certifiable since the REF re-record): the three r15 shuffle
# debuts + re-record of the six r15 Table-7 shuffle denominators
# (ADVICE r15 medium — their recording window carried 1.167x slack).
cd /root/repo
cert=0
for i in 1 2 3 4 5 6 7 8 9 10; do
  python scripts/record_quiet_bars.py --family shuffle \
    text_quality_classifier text_classifier_holdout_eval agg_theil_index \
    text_bpe_apply text_bpe_pack_sequences sample_shuffle_global \
    agg_weighted_percentile graph_label_propagation agg_gini_grouped \
    > /root/repo/.bars_r16/B_$i.json 2> /root/repo/.bars_r16/B_$i.err
  if [ $? -eq 0 ]; then cert=$((cert+1)); fi
  if [ $cert -ge 2 ]; then break; fi
  sleep 150
done
echo "done certified=$cert" > /root/repo/.bars_r16/B_done
