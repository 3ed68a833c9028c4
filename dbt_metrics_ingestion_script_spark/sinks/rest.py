"""Batched, partition-parallel REST sink.

Replaces the reference's one-synchronous-POST-per-entity loop
(/root/reference/dbt_metrics_to_datahub.py:354-359) with
`foreachPartition`: one HTTP session per partition, payloads sent in
batches.  Batch failures are caught and counted (per-entity error
isolation, the reference's E1 posture scaled to batches) instead of
failing the task -- an HTTP error therefore cannot trigger Spark task
retries that would re-POST already-sent batches, and a persistently
broken endpoint degrades to a failure count, not a job abort.

Delivery semantics are AT-LEAST-ONCE: if a task dies for unrelated
reasons (executor loss, OOM) after some batches were sent, the retried
task re-sends them.  Downstream ingestion should be idempotent on
(entityUrn, aspectName) -- true for DataHub-style aspect upserts, which
is exactly the payload shape emitted here.  Counters are Spark
accumulators, so retried tasks may overcount sends; treat the stats as
observability, not an exactly-once ledger.

Network code uses only the standard library.  This sink is exercised
with a mock server in tests; against a real endpoint set `endpoint` to
the ingestion URL.
"""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame


def _post_batch(endpoint: str, token: str | None, batch: list[dict], timeout: float) -> None:
    body = json.dumps({"proposals": batch}).encode()
    req = urllib.request.Request(endpoint, data=body, method="POST")
    req.add_header("Content-Type", "application/json")
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        if resp.status >= 300:
            raise RuntimeError(f"sink POST failed: HTTP {resp.status}")


class RestSink:
    def __init__(
        self,
        endpoint: str,
        token: str | None = None,
        batch_size: int = 100,
        timeout: float = 30.0,
    ) -> None:
        self.endpoint = endpoint
        self.token = token
        self.batch_size = batch_size
        self.timeout = timeout

    def emit(self, emissions: DataFrame) -> dict:
        endpoint, token = self.endpoint, self.token
        batch_size, timeout = self.batch_size, self.timeout
        sc = emissions.sparkSession.sparkContext
        n_sent = sc.accumulator(0)
        n_failed = sc.accumulator(0)

        def flush(batch: list[dict]) -> None:
            try:
                _post_batch(endpoint, token, batch, timeout)
                n_sent.add(len(batch))
            except Exception:
                # batch-level isolation: count and continue; never let an
                # HTTP failure fail the task (which would re-POST every
                # batch this partition already delivered)
                n_failed.add(len(batch))

        def handle_partition(rows) -> None:
            batch: list[dict] = []
            for row in rows:
                batch.append(
                    {
                        "entityUrn": row["entity_urn"],
                        "aspectName": row["aspect_name"],
                        "aspect": json.loads(row["payload"]),
                    }
                )
                if len(batch) >= batch_size:
                    flush(batch)
                    batch = []
            if batch:
                flush(batch)

        emissions.foreachPartition(handle_partition)
        return {
            "mode": "rest",
            "endpoint": self.endpoint,
            "n_sent": n_sent.value,
            "n_failed": n_failed.value,
        }
