#!/bin/sh
# Build the --py-files artifact for spark-submit.
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
python -c "
import zipfile, pathlib
with zipfile.ZipFile('engine.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for p in sorted(pathlib.Path('martial_arts_ocr_spark').rglob('*.py')):
        z.write(p)
print('engine.zip written')
"
