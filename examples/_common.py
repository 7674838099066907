from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def example_args(description: str) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    return parser.parse_args()


def example_session(name: str):
    from redshells_spark import get_spark_session

    spark = get_spark_session(name, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    return spark
