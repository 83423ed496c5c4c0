"""Checkpoint ledger — per-partition lineage so a killed build resumes
without recomputation.

Recast of the reference's lease-based source coordination
(/root/reference/data-prepper-core/.../LeaseBasedSourceCoordinator.java:38,56,230,271,294
and the in-memory/DynamoDB partition stores): each unit of work
(stage, partition_id) gets a row with status + counts + input fingerprint,
committed atomically (temp file + rename) only AFTER the corresponding
data commit — the same "positive acknowledgement then completePartition"
ordering as ScanObjectWorker.java:130-138.

Schema (FIXTURES.md F3): stage, partition_id, status, token_count,
posting_count, input_fingerprint, committed_at.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class Ledger:
    def __init__(self, index_dir: str):
        self.path = os.path.join(index_dir, "_ledger.jsonl")
        self._rows: list[dict] = []
        if os.path.exists(self.path):
            with open(self.path) as f:
                self._rows = [json.loads(line) for line in f if line.strip()]

    def completed(self, stage: str, input_fingerprint: str | None = None) -> set:
        """Partition ids already committed for *stage* (matching fingerprint)."""
        out = set()
        for r in self._rows:
            if r["stage"] == stage and r["status"] == "COMPLETED":
                if input_fingerprint is None or r.get("input_fingerprint") == input_fingerprint:
                    out.add(r["partition_id"])
        return out

    def commit(
        self,
        stage: str,
        partition_id,
        token_count: int = 0,
        posting_count: int = 0,
        input_fingerprint: str = "",
        status: str = "COMPLETED",
    ) -> None:
        row = {
            "stage": stage,
            "partition_id": partition_id,
            "status": status,
            "token_count": int(token_count),
            "posting_count": int(posting_count),
            "input_fingerprint": input_fingerprint,
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        self._rows.append(row)
        tmp = f"{self.path}.tmp.{uuid.uuid4().hex}"
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        with open(tmp, "w") as f:
            for r in self._rows:
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, self.path)  # atomic publish, like completePartition

    def rows(self) -> list[dict]:
        return list(self._rows)
