#!/bin/bash
# Download the alanine-dipeptide validation data used by the AlaDip target's
# evaluation plots (reference: bin/download_aladip.sh fetches aladip_val.pt
# from the fab-torch release assets). Requires network access.
set -e
cd "$(dirname "$0")/../data"
URL="https://github.com/lollcat/fab-torch/releases/download/v0.0.0/aldp_500K_train_mini.h5"
echo "Fetching AlaDip validation data..."
curl -L -o aladip_val.h5 "$URL"
echo "Saved data/aladip_val.h5 (pass eval_data_path=data/aladip_val.h5 to AlaDip)"
