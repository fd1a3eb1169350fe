#!/bin/sh
# Build the native extension in-place (also done by `pip install .` via
# setup.py; this script is the quick dev path).
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O2 -std=c++17 -shared -fPIC -I"$PYINC" openfdcm_native.cpp -lz -lpthread \
    -o "../openfdcm_tpu/_native$EXT"
echo "built openfdcm_tpu/_native$EXT"
