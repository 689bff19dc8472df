"""Mock-data CLI: the LocalAvroDump / PubSubProducer analogue.

Reference: ``utils/LocalAvroDump.scala:15-31`` writes a bounded mock
Avro file; ``PubSubProducer.scala:22-49`` publishes N mocks with
jittered transaction ids.

Usage:
  python tools/gen_mock_data.py OUT_DIR [--n 1000] [--keys K] [--shards S]
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--keys", type=int, default=None,
                    help="distinct key cardinality (forces duplicates)")
    ap.add_argument("--shards", type=int, default=None)
    args = ap.parse_args()

    from scio_db_spark.session import SessionFactory
    from scio_db_spark.sinks.files import write_sharded
    from scio_db_spark.sources.mockdata import mock_bers

    spark = SessionFactory.create("gen-mock-data")
    spark.sparkContext.setLogLevel("ERROR")
    df = mock_bers(spark, args.n, distinct_keys=args.keys)
    write_sharded(df, args.out_dir, num_shards=args.shards, mode="overwrite")
    print(f"wrote {args.n} mock BERs to {args.out_dir}")


if __name__ == "__main__":
    main()
