"""Durable at-least-once event queue (serving/eventqueue.py): no event loss
across crash-mid-delivery, DLQ after max attempts, torn-tail recovery,
segment compaction, telemetry integration.

Mirrors the reference's Pub/Sub provisioning semantics
(`scripts/setup_pubsub.sh:22-35`: DLQ topics, --max-delivery-attempts=5)."""
import json

import pytest

from plotpointe_tpu.serving.eventqueue import Deliverer, DurableQueue, DurableQueueSink
from plotpointe_tpu.serving.telemetry import ServingTelemetry


@pytest.fixture(autouse=True)
def _nosync(monkeypatch):
    # fsync per event is the production default; tests don't need disk-barrier
    # latency (durability under process crash is simulated by reopening)
    monkeypatch.setenv("PLOTPOINTE_QUEUE_NOSYNC", "1")


def test_publish_pull_ack_roundtrip(tmp_path):
    q = DurableQueue(tmp_path / "q")
    offs = [q.publish({"i": i}) for i in range(10)]
    assert offs == list(range(10))
    batch = q.pull(100)
    assert [d["i"] for _, d in batch] == list(range(10))
    q.ack([o for o, _ in batch])
    assert q.backlog() == 0
    assert q.pull(100) == []
    q.close()


def test_lease_blocks_double_delivery_until_expiry(tmp_path):
    q = DurableQueue(tmp_path / "q", lease_s=1000.0)
    q.publish({"x": 1})
    assert len(q.pull(10)) == 1
    assert q.pull(10) == []  # leased, not redelivered
    q.close()


def test_crash_mid_delivery_loses_nothing(tmp_path):
    root = tmp_path / "q"
    q = DurableQueue(root)
    for i in range(50):
        q.publish({"i": i})
    pulled = q.pull(20)  # consumer takes a lease on 20...
    assert len(pulled) == 20
    q.close()  # ...and CRASHES before acking any

    q2 = DurableQueue(root)  # restart: leases were in-memory only
    redelivered = q2.pull(100)
    assert sorted(d["i"] for _, d in redelivered) == list(range(50))  # zero loss
    q2.ack([o for o, _ in redelivered])
    q2.close()

    q3 = DurableQueue(root)  # acks are durable
    assert q3.backlog() == 0
    q3.close()


def test_crash_mid_publish_torn_tail_recovers(tmp_path):
    root = tmp_path / "q"
    q = DurableQueue(root)
    q.publish({"i": 0})
    q.publish({"i": 1})
    q.close()
    # simulate a crash mid-write: torn partial line at the tail of the segment
    seg = next(root.glob("segment-*.jsonl"))
    with open(seg, "a") as f:
        f.write('{"o": 2, "d": {"i": 2')  # no close, no newline

    q2 = DurableQueue(root)
    assert [d["i"] for _, d in q2.pull(10)] == [0, 1]
    # the torn record was never durable -> its offset is reused safely
    assert q2.publish({"i": "next"}) == 2
    q2.close()


def test_dlq_after_max_attempts(tmp_path):
    q = DurableQueue(tmp_path / "q", max_attempts=5, lease_s=0.0)
    for i in range(5):
        q.publish({"i": i})

    def deliver(rec):
        if rec["i"] == 3:
            raise RuntimeError("downstream 500")

    d = Deliverer(q, deliver)
    stats = d.drain()
    assert stats["delivered"] == 4
    assert stats["dead_lettered"] == 1
    dead = q.dead_letters()
    assert len(dead) == 1 and dead[0]["d"]["i"] == 3 and dead[0]["attempts"] == 5
    assert "downstream 500" in dead[0]["reason"]
    assert q.backlog() == 0  # DLQ'd record left the main flow
    q.close()


def test_attempt_counts_survive_restart(tmp_path):
    root = tmp_path / "q"
    q = DurableQueue(root, max_attempts=3, lease_s=0.0)
    off = q.publish({"i": 0})
    assert q.nack(off, {"i": 0}, "fail1") is False
    assert q.nack(off, {"i": 0}, "fail2") is False
    q.close()
    q2 = DurableQueue(root, max_attempts=3, lease_s=0.0)
    assert q2.nack(off, {"i": 0}, "fail3") is True  # 3rd attempt -> DLQ
    assert len(q2.dead_letters()) == 1
    q2.close()


def test_segment_rotation_and_compaction(tmp_path):
    q = DurableQueue(tmp_path / "q", segment_bytes=200)  # tiny -> many segments
    for i in range(30):
        q.publish({"i": i, "pad": "x" * 40})
    segs = list((tmp_path / "q").glob("segment-*.jsonl"))
    assert len(segs) > 2
    batch = q.pull(1000)
    assert len(batch) == 30
    q.ack([o for o, _ in batch])
    removed = q.compact()
    assert removed >= len(segs) - 1  # everything but the active segment
    assert q.read_all() != [] or q.backlog() == 0
    q.close()


def test_restart_after_compact_does_not_reuse_acked_offsets(tmp_path):
    # regression: with every segment compacted away, the offset counter must
    # recover from the ack log — otherwise new publishes reuse acked offsets
    # and are never delivered (silent at-least-once violation)
    root = tmp_path / "q"
    q = DurableQueue(root, segment_bytes=100)
    for i in range(10):
        q.publish({"i": i, "pad": "x" * 40})
    batch = q.pull(100)
    q.ack([o for o, _ in batch])
    q.close()  # close BEFORE compact so even the active segment is removable
    q = DurableQueue(root)
    q.compact()
    assert list(root.glob("segment-*.jsonl")) == []  # all segments gone
    q.close()

    q2 = DurableQueue(root)  # restart from acks.jsonl alone
    off = q2.publish({"i": "fresh"})
    assert off == 10  # NOT a reused acked offset
    redelivered = q2.pull(100)
    assert [d["i"] for _, d in redelivered] == ["fresh"]
    assert q2.backlog() == 1
    q2.close()


def test_restart_after_compact_with_nacked_offsets(tmp_path):
    # attempts.jsonl must also feed the high-water mark: a record can be
    # nacked to the DLQ (acked) and compacted with no surviving ack... the
    # attempts log still knows its offset
    root = tmp_path / "q"
    q = DurableQueue(root, max_attempts=1, lease_s=0.0)
    off = q.publish({"i": 0})
    assert q.nack(off, {"i": 0}, "fail") is True  # straight to DLQ + ack
    q.close()
    q2 = DurableQueue(root)
    assert q2.publish({"i": 1}) == off + 1
    q2.close()


def test_telemetry_durable_sink_and_drift(tmp_path):
    tel = ServingTelemetry(root=str(tmp_path / "tel"), durable=True)
    rid = tel.log_request([1, 2, 3], [0.9, 0.8, 0.7], latency_ms=4.2)
    tel.log_feedback(request_id=rid, item_id=2, event_type="click")
    drift = tel.aggregate_drift()
    assert len(drift) == 1 and drift[0]["n_requests"] == 1

    # auto-detect: a fresh instance (cli drift) finds the durable layout
    tel2 = ServingTelemetry(root=str(tmp_path / "tel"))
    assert tel2.durable is True
    assert tel2.aggregate_drift() == drift

    # the subscription worker drains the queue into a downstream store
    delivered = []
    stats = Deliverer(tel.requests.queue, delivered.append).drain()
    assert stats["delivered"] == 1 and delivered[0]["request_id"] == rid
