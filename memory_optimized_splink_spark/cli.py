"""spark-submit entry point: each stage runs standalone and resumes from the
checkpoint registry (north rule: `spark-submit --py-files pkg.zip -m ...
block|train|predict|cluster|evaluate|bench`, every stage resumable).

Usage:
  spark-submit --py-files memory_optimized_splink_spark.zip \\
      -m memory_optimized_splink_spark.cli predict \\
      --input /data/repo_files.parquet --settings model.json \\
      --checkpoint-dir /ckpt --output /out/predictions
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from .linker import SparkLinker
from .model import Settings
from .session import get_spark
from .sources.registry import read_any, write_output


def _linker(args) -> SparkLinker:
    spark = get_spark(app_name=f"mos-spark-{args.stage}",
                      checkpoint_dir=args.checkpoint_dir)
    df = read_any(spark, args.input)
    if args.derive_repo_ids:
        from .operators.nodes import derive_repo_file_ids
        df = derive_repo_file_ids(df)
    with open(args.settings) as f:
        settings = Settings.from_json(f.read())
    return SparkLinker(spark, df, settings,
                       checkpoint_dir=args.checkpoint_dir,
                       enable_checkpoints=True)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="memory_optimized_splink_spark")
    ap.add_argument("stage", choices=["block", "train", "predict", "cluster",
                                      "evaluate", "bench"])
    ap.add_argument("--input", required=True)
    ap.add_argument("--settings", required=True)
    ap.add_argument("--checkpoint-dir", default="/tmp/mos_spark_ckpt")
    ap.add_argument("--output")
    ap.add_argument("--threshold", type=float, default=0.9)
    ap.add_argument("--labels")
    ap.add_argument("--labels-column",
                    help="evaluate: ground-truth cluster COLUMN on the input "
                         "(reference truth_space_table_from_labels_column) "
                         "instead of a pairwise --labels table")
    ap.add_argument("--max-pairs", type=float, default=1e7)
    ap.add_argument("--em-rule", help="blocking key expr list, comma separated")
    ap.add_argument("--derive-repo-ids", action="store_true")
    args = ap.parse_args(argv)

    linker = _linker(args)

    if args.stage == "block":
        out = linker.blocked_pairs()
    elif args.stage == "train":
        linker.estimate_u(max_pairs=args.max_pairs)
        if args.em_rule:
            from .model import block_on
            linker.estimate_m_with_em(block_on(*args.em_rule.split(",")))
        print(linker.settings.to_json())
        if args.output:
            with open(args.output, "w") as f:
                f.write(linker.settings.to_json())
        return
    elif args.stage == "predict":
        out = linker.predict()
    elif args.stage == "cluster":
        out = linker.cluster(args.threshold)
    elif args.stage == "evaluate":
        if args.labels_column:
            out = linker.truth_space_from_labels_column(args.labels_column)
        else:
            labels = read_any(linker.spark, args.labels)
            out = linker.truth_space(labels)
    else:  # bench
        import subprocess
        subprocess.run([sys.executable, "bench.py"], check=True)
        return

    if args.output:
        write_output(out, args.output)
    else:
        print(json.dumps({"rows": out.count(), "stage": args.stage}))


if __name__ == "__main__":
    main()
