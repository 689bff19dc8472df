"""End-to-end mediation pipeline test (SURVEY.md §3.1).

The Spark analogue of the reference's flagship spec
(MediationServiceSpec.scala:45-83): deterministic micro-batches through
validate → key → historical anti-join → stateful TTL dedup, asserting
the full routing contract.
"""

from __future__ import annotations

from pyspark.sql import Row

from scio_db_spark.streaming.harness import StreamHarness
from scio_db_spark.streaming.mediation import build_mediation_core

FLAT = (
    "transaction_id string, notification_id string, customer_id string, "
    "message string, ts double"
)


def _ber(tx, nid, cid, msg="m", ts=1.0):
    return Row(
        transaction_id=tx, notification_id=nid, customer_id=cid,
        message=msg, ts=ts,
    )


def test_mediation_core_end_to_end(spark):
    # Historical: key tx0-9 was already notified (J1 anti-join drop).
    hist = spark.createDataFrame([Row(idempotent_key="tx0-9")])

    h = StreamHarness(spark, FLAT)
    h.start(
        lambda s: build_mediation_core(
            s, historical_df=hist, ttl_seconds=3600, order_cols=["ts"],
            use_timers=False,
        )["deduped"]
    )
    h.add_batch(
        [
            _ber("tx1", "n1", "1", ts=1.0),
            _ber("tx1", "n1", "1", ts=2.0),   # duplicate in-batch
            _ber("tx0", "n0", "9", ts=1.0),   # historical -> dropped
            _ber(None, "n2", "2", ts=1.0),    # invalid -> KO branch
            _ber("tx3", "n3", "3", ts=1.0),
        ]
    )
    rows = h.results()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.idempotent_key, []).append(r.send_status)
    assert sorted(by_key["tx1-1"]) == ["SENT", "SENT_OR_DUPLICATED"]
    assert by_key["tx3-3"] == ["SENT"]
    assert "tx0-9" not in by_key          # dropped by anti-join
    assert not any(k.startswith("n2") for k in by_key)  # invalid not sent

    # Second batch: tx1-1 still inside TTL -> duplicate.
    h.add_batch([_ber("tx1", "n1", "1", ts=9.0)])
    rows = h.results()
    assert [
        s for r in rows if r.idempotent_key == "tx1-1"
        for s in [r.send_status]
    ].count("SENT") == 1
    h.stop()


def test_mediation_ko_branch(spark):
    from scio_db_spark.operators.keying import with_idempotent_key
    from scio_db_spark.operators.validity import split_ok_ko
    from scio_db_spark.streaming.mediation import validity_predicate

    df = spark.createDataFrame(
        [
            _ber("tx1", "n1", "1"),
            _ber(None, "n2", "2"),
            _ber("tx3", None, "3"),
        ],
        FLAT,
    )
    keyed = with_idempotent_key(df, "transaction_id", "customer_id")
    ok, ko = split_ok_ko(keyed, validity_predicate())
    assert [r.transaction_id for r in ok.collect()] == ["tx1"]
    assert {(r.transaction_id, r.notification_id) for r in ko.collect()} == {
        (None, "n2"),
        ("tx3", None),
    }
