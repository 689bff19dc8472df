"""Span-excision scaling leg (round-11 item 3's operator at scale).

Runs plans/textops.py::span_excise — the fixed-unroll exact-substring
remover — on the duplication-heavy synthetic corpus from
tools/bench_lsh_dupheavy.py (40% verbatim viral copies: a worst-case
shape where the duplicate-shingle set covers most of the corpus), at
``BENCH_EXCISE_ROWS`` rows (default 500K ≈ ×100 the sf0.01 documents
table). Reports wall time, exact token integers pre/post, and the
per-task max/median of the heaviest stage (each round is a span-keyed
semi-join + per-doc windows — uniform keys, so the claim is flat
tasks even at 40% duplication).

Output: one JSON line — recorded as BENCH_LOCAL_r11_span_excise.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from benchgate import preflight_load_gate  # noqa: E402
from bench_lsh_dupheavy import _corpus  # noqa: E402
from bench_skew import _completed_stage_ids, _task_summary  # noqa: E402
from scio_db_spark.session import SessionFactory  # noqa: E402

N_ROWS = int(os.environ.get("BENCH_EXCISE_ROWS", 500_000))


def main() -> int:
    _gate = preflight_load_gate("bench_span_excise")
    spark = SessionFactory.create("bench-span-excise")
    spark.sparkContext.setLogLevel("ERROR")

    from scio_db_spark.plans.textops import span_excise

    d = _corpus(spark, N_ROWS)
    before = _completed_stage_ids(spark)
    t0 = time.perf_counter()
    agg = span_excise(d).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens_pre").alias("tokens_pre"),
        F.sum("n_tokens_post").alias("tokens_post"),
        F.sum(
            F.when(
                F.col("n_tokens_post") < F.col("n_tokens_pre"), 1
            ).otherwise(0)
        ).alias("docs_touched"),
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    out = {
        "metric": "span_excise_scaling",
        "rows": N_ROWS,
        "wall_sec": wall,
        "n_docs": agg.n_docs,
        "tokens_pre": int(agg.tokens_pre),
        "tokens_post": int(agg.tokens_post),
        "tokens_excised": int(agg.tokens_pre - agg.tokens_post),
        "docs_touched": int(agg.docs_touched),
        **_task_summary(spark, before),
        "load_1m": list(os.getloadavg())[:2],
        **_gate,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
