#!/usr/bin/env bash
# North-rule launch path: the pipeline via spark-submit --py-files (the
# packaging a real cluster submit uses — same CLI as `python -m
# language_identification_spark`). Usage:
#
#   tools/spark_submit_demo.sh [master] [workdir]
#
# Builds the package zip, synthesizes a pages parquet from the fixture
# generator, submits, and prints the resume manifest. Verified end-to-end in
# this sandbox (local[8]); on a cluster swap --master and point --input at
# the real pages table.
set -euo pipefail
MASTER="${1:-local[8]}"
WORK="${2:-$(mktemp -d /tmp/liq_submit.XXXX)}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"

cd "$REPO"
zip -qr "$WORK/language_identification_spark.zip" language_identification_spark \
    -x "*.pyc" -x "*__pycache__*"
cat > "$WORK/driver.py" <<'PY'
from language_identification_spark.__main__ import main
import sys
main(sys.argv[1:])
PY
python3 - "$WORK" <<'PY'
import sys
from language_identification_spark.fixtures import build_pages
import pandas as pd
df = pd.DataFrame(build_pages(120))
# parquet timestamps must be micros: Spark rejects pandas' default NANOS
df["warc_ts"] = df["warc_ts"].astype("datetime64[us, UTC]")
df.to_parquet(sys.argv[1] + "/pages.parquet")
PY

# the north rule's model-distribution path: the (production-shaped,
# trained) .ftz ships via --files; the CLI gets the BARE FILENAME, so
# executors must resolve it through SparkFiles — exactly the cluster shape
python3 - "$WORK" <<'PY'
import sys
from language_identification_spark.fixtures import training_corpus
from language_identification_spark.operators.fasttext_train import (
    build_production_ftz,
)
build_production_ftz(sys.argv[1] + "/lid_prod.ftz", training_corpus())
PY

spark-submit --master "$MASTER" \
    --py-files "$WORK/language_identification_spark.zip" \
    --files "$WORK/lid_prod.ftz" \
    "$WORK/driver.py" \
    --input "$WORK/pages.parquet" --output "$WORK/out" --buckets 4 --no-kn \
    --fasttext-model lid_prod.ftz
echo "results: $WORK/out"
cat "$WORK/out/_progress.json"
