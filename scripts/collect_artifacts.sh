#!/bin/sh
# Sequential TPU artifact collection: train bench, 1024^2 bench, eval grids.
# Each step appends one JSON line to goldens/bench_records.jsonl (plus the
# full eval summaries under goldens/).
set -x
mkdir -p goldens
R=goldens/bench_records.jsonl

python bench.py --mode train            | tail -1 >> $R
python bench.py --mode train --no-pallas --iters 10 | tail -1 >> $R
python bench.py --size 1024 --batch 2 --iters 10   | tail -1 >> $R
python bench.py --mode latency          | tail -1 >> $R
python bench.py                          | tail -1 >> $R
python bench.py --mode meta --iters 5    | tail -1 >> $R
python bench.py --mode sweep --batch 4   | tail -1 >> $R
python bench.py --mode train --train_mode fast_adaptation --iters 10 | tail -1 >> $R
python bench.py --mode locked            | tail -1 >> $R
python bench.py --mode locked --chunks 8 | tail -1 >> $R
python bench.py --mode spatial --size 1024 --batch 4 --iters 10 | tail -1 >> $R

python -m mastermetastyletransfer_tpu.eval.cli \
  --content_dir /root/reference/test/content_input \
  --style_dir /root/reference/test/style_input \
  --image_size 256 --k 1 --lambda_style 4 \
  > goldens/evalgrid_k1_lambda4.json
python -m mastermetastyletransfer_tpu.eval.cli \
  --content_dir /root/reference/test/content_input \
  --style_dir /root/reference/test/style_input \
  --image_size 256 --k 3 --lambda_style 4 \
  > goldens/evalgrid_k3_lambda4.json
python -m mastermetastyletransfer_tpu.eval.cli \
  --content_dir /root/reference/test/content_input \
  --style_dir /root/reference/test/style_input \
  --image_size 256 --k 1 --lambda_style 2 \
  > goldens/evalgrid_k1_lambda2.json
python -m mastermetastyletransfer_tpu.eval.cli \
  --content_dir /root/reference/test/content_input \
  --style_dir /root/reference/test/style_input \
  --image_size 256 --k 3 --lambda_style 2 \
  > goldens/evalgrid_k3_lambda2.json
echo DONE
