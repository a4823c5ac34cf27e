"""spark-submit entrypoint (north rule: runs via spark-submit --py-files).

Back-compat shim over the package CLI (``python -m graphriccicurvature_spark``,
graphriccicurvature_spark/__main__.py) — the single implementation of job
dispatch, input auto-detection and session building now lives there.

Package and submit::

    cd /root/repo && zip -qr /tmp/grc_spark.zip graphriccicurvature_spark
    spark-submit --py-files /tmp/grc_spark.zip scripts/run_job.py \
        --job curvature --input /data/pages_parquet --output /data/curvature_out \
        [--mode ego --method OTDSinkhornMix --alpha 0.5]

Jobs: curvature | flow | pagerank | components | triangles | community —
plus every op the package CLI accepts (repetition, minhash-dedup, ...).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--job", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    args, passthrough = p.parse_known_args(argv)

    from graphriccicurvature_spark.__main__ import main as cli_main

    cli_main([args.job, "--input", args.input, "--output", args.output, *passthrough])


if __name__ == "__main__":
    main(sys.argv[1:])
