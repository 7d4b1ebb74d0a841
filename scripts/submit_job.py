"""spark-submit entry script.

spark-submit needs a file, not a module; this shim forwards to the package
CLI so the identical command surface works under spark-submit and
``python -m bluegraph_spark``:

    spark-submit --master yarn --deploy-mode cluster \
        --py-files dist/bluegraph_spark.zip \
        scripts/submit_job.py pagerank --edges ... --output ...
"""

import sys

from bluegraph_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
