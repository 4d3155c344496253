"""spark-submit entry point for the full forge pipeline.

The BASELINE.json north_rule ships the job via ``spark-submit
--py-files``; this is that driver script:

    python tools/make_pyfiles.py
    spark-submit --master local[8] \
        --py-files dist/graphforge_spark.zip \
        tools/submit_job.py \
        --sf-dir /root/testdata/sf0.001 --warehouse /tmp/forge_wh

It derives the four-format transcript corpus from the sf dir, runs the
resumable forge (extract → dedup → link → canonicalize → materialize +
N-Triples export), and prints one JSON metrics line. Re-running with the
same warehouse resumes from the checkpoint gate (idempotent).
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--no-link", action="store_true")
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args()

    # Under spark-submit the session already exists; standalone it is built
    # here. Imports resolve from --py-files (or the repo checkout).
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("graphforge-forge").getOrCreate()

    from graphforge_spark import corpus
    from graphforge_spark.pipeline import forge

    transcripts = corpus.derive_all_transcripts(spark, args.sf_dir)
    metrics = forge(
        spark,
        transcripts,
        warehouse=args.warehouse,
        n_buckets=args.buckets,
        do_link=not args.no_link,
        # corpus composition is part of the input's identity: a resumed
        # warehouse built from a DIFFERENT composition must re-extract,
        # not silently skip buckets whose conv ids happen to collide
        input_fingerprint=f"four-format-v1:{args.sf_dir}",
    )
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
