"""spark-submit primary script for the extraction pipeline.

spark-submit runs its primary file as a top-level script (no package
parent), so ``datamunging_spark/__main__.py``'s relative imports cannot
be the primary file — this shim is. The package itself ships to the
driver and every executor via ``--py-files``:

    cd <repo> && zip -qr /tmp/dm.zip datamunging_spark
    spark-submit --py-files /tmp/dm.zip \
        --conf spark.sql.adaptive.enabled=true \
        tools/submit.py \
        --job munge \
        --input  /data/volumes \
        --output /data/volumes_out \
        --run-id run-2026-08-17

Arguments are exactly ``datamunging_spark.__main__``'s (see its
argparse). Verified end-to-end by
``tests/test_submit.py::test_spark_submit_py_files_end_to_end``.
"""

import sys

from datamunging_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
