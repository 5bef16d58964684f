#!/bin/sh
# Fetch the training datasets the reference uses (reference:
# download_datasets.sh:1-15): COCO train2017 (content) and WikiArt (style),
# into ./datasets — the default paths in DataConfig.
set -e
mkdir -p datasets
cd datasets

echo "downloading COCO train2017 (~19 GB)..."
wget -c http://images.cocodataset.org/zips/train2017.zip
mkdir -p coco_train_dataset
unzip -qn train2017.zip -d coco_train_dataset

echo "downloading WikiArt (~25 GB)..."
wget -c https://huggingface.co/datasets/huggan/wikiart/resolve/main/wikiart.zip \
    || echo "WikiArt mirror unavailable; place the archive at datasets/wikiart.zip manually"
[ -f wikiart.zip ] && mkdir -p wikiart && unzip -qn wikiart.zip -d wikiart

echo "done: datasets/coco_train_dataset/train2017, datasets/wikiart"
