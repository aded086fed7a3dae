"""CLI for the reference-workload workflow:

    python -m sentiment_analysis_bigdata_spark.apps preprocess \
        --input raw/ --output clean/ --stats stats.json
    python -m sentiment_analysis_bigdata_spark.apps train \
        --model lr --features tfidf --input clean/ --out-dir artifacts/
    python -m sentiment_analysis_bigdata_spark.apps compare \
        --metrics-dir artifacts/ --out comparison.json
"""

from __future__ import annotations

import argparse
import json

from sentiment_analysis_bigdata_spark import get_spark
from sentiment_analysis_bigdata_spark.apps import workflow


def main() -> None:
    ap = argparse.ArgumentParser(prog="sentiment_analysis_bigdata_spark.apps")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("preprocess", help="raw tweets → clean CSV + stats JSON")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--stats")
    p.add_argument("--input-format", default="csv", choices=["csv", "parquet"])
    p.add_argument("--num-files", type=int, default=4)
    p.add_argument("--charts-dir", help="render preprocessing PNGs here")

    t = sub.add_parser("train", help="clean tweets → fitted model + metrics JSON")
    t.add_argument("--model", required=True, choices=["lr", "svm", "nb"])
    t.add_argument("--features", default="tfidf", choices=["tfidf", "ngram"])
    t.add_argument("--input", required=True)
    t.add_argument("--out-dir", required=True)
    t.add_argument("--input-format", default="csv", choices=["csv", "parquet"])
    t.add_argument("--charts-dir", help="render confusion/ROC PNGs here")

    c = sub.add_parser("compare", help="merge per-model metrics JSONs")
    c.add_argument("--metrics-dir", required=True)
    c.add_argument("--out")
    c.add_argument("--charts-dir", help="render comparison PNGs here")

    from sentiment_analysis_bigdata_spark.apps import corpus

    corpus.register_cli(sub)

    args = ap.parse_args()
    if args.cmd == "compare":
        print(
            json.dumps(
                workflow.compare_models(
                    args.metrics_dir, args.out, charts_dir=args.charts_dir
                ),
                indent=2,
            )
        )
        return

    spark = get_spark(f"app-{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.cmd.startswith("corpus-"):
            out = corpus.run_cli(spark, args)
        elif args.cmd == "preprocess":
            out = workflow.preprocess(
                spark,
                args.input,
                args.output,
                stats_path=args.stats,
                num_output_files=args.num_files,
                input_format=args.input_format,
                charts_dir=args.charts_dir,
            )
        else:
            out = workflow.train_model(
                spark,
                args.input,
                args.model,
                args.out_dir,
                features=args.features,
                input_format=args.input_format,
                charts_dir=args.charts_dir,
            )
        print(json.dumps(out, indent=2))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
