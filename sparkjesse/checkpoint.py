"""Per-partition checkpoint/resume ledger (north rule).

A long validation run over a 10^12-row table is driven as a sequence of
*input-partition batches* (e.g. Iceberg partitions / parquet file groups).
After each batch, one ledger row is appended atomically:

    (partition_id, status, plan_hash, snapshot_id, attempt,
     docs, pass, fail, ts)

``plan_hash`` fingerprints the compiled schema + engine version and
``snapshot_id`` the input snapshot, so a resumed run only skips work whose
lineage matches — change the schema and everything re-runs. On restart,
``pending_partitions`` anti-joins the done set. The ledger itself is tiny
(one row per partition), stored as JSON-lines per-partition files so the
"append" is an atomic file create — no read-modify-write races between
attempts. Iceberg would give us this via snapshots; the sandbox has no
Iceberg runtime jar, so the ledger is engine code with the same contract
(SURVEY.md §4.2 "checkpoint/resume ledger").
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame


def plan_hash(schema: dict, extra: str = "") -> str:
    payload = json.dumps(schema, sort_keys=True) + "|" + extra
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


@dataclass
class LedgerEntry:
    partition_id: str
    status: str            # done | failed
    plan_hash: str
    snapshot_id: str
    attempt: int
    metrics: dict = field(default_factory=dict)
    ts: float = 0.0

    def to_json(self) -> str:
        return json.dumps({
            "partition_id": self.partition_id, "status": self.status,
            "plan_hash": self.plan_hash, "snapshot_id": self.snapshot_id,
            "attempt": self.attempt, "metrics": self.metrics, "ts": self.ts,
        }, sort_keys=True)


class CheckpointLedger:
    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _read_all(self) -> list[LedgerEntry]:
        out = []
        for name in sorted(os.listdir(self.path)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.path, name), encoding="utf-8") as fh:
                for line in fh:
                    if line.strip():
                        d = json.loads(line)
                        out.append(LedgerEntry(**d))
        return out

    def record(self, entry: LedgerEntry) -> None:
        """Atomic append: write a unique temp file then rename (same-dir
        rename is atomic on POSIX). The filename embeds a *sanitized*
        partition id — ids are arbitrary strings (often paths), and
        ``os.path.join`` would otherwise escape the ledger dir on an
        absolute id."""
        entry.ts = entry.ts or time.time()
        safe = hashlib.sha256(entry.partition_id.encode()).hexdigest()[:16]
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(
            self.path,
            f"{safe}-{entry.attempt}-{uuid.uuid4().hex[:8]}.json")
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.write(entry.to_json() + "\n")
        os.rename(tmp, final)

    def done_partitions(self, plan: str, snapshot: str) -> set[str]:
        return {e.partition_id for e in self._read_all()
                if e.status == "done" and e.plan_hash == plan
                and e.snapshot_id == snapshot}

    def done_pairs(self, plan: str) -> set[tuple[str, str]]:
        """(partition_id, snapshot_id) pairs with a done row under
        ``plan`` — the lookup for per-partition (incremental) lineage,
        where each batch carries its own snapshot token."""
        return {(e.partition_id, e.snapshot_id) for e in self._read_all()
                if e.status == "done" and e.plan_hash == plan}

    def attempts(self, partition_id: str) -> int:
        return sum(1 for e in self._read_all()
                   if e.partition_id == partition_id)

    def metrics_rows(self) -> list[dict]:
        return [json.loads(e.to_json()) for e in self._read_all()]

    def lineage_metrics(self, plan: str,
                        snapshot: "str | dict[str, str]") -> list[dict]:
        """Done metrics for ONE lineage — latest attempt per partition.
        Totals must never sum raw ``metrics_rows()``: after a schema or
        data change the ledger still holds old-lineage rows (and
        possibly several attempts per partition), which would
        double-count docs/fail. ``snapshot`` may be a per-partition
        token dict (incremental lineage): a row counts only if it
        matches ITS partition's current token, so batches re-validated
        after an append contribute exactly their latest run."""
        if isinstance(snapshot, dict):
            def match(e: LedgerEntry) -> bool:
                return e.snapshot_id == snapshot.get(e.partition_id)
        else:
            def match(e: LedgerEntry) -> bool:
                return e.snapshot_id == snapshot
        best: dict[str, LedgerEntry] = {}
        for e in self._read_all():
            if e.status != "done" or e.plan_hash != plan \
                    or not match(e):
                continue
            cur = best.get(e.partition_id)
            if cur is None or e.attempt > cur.attempt:
                best[e.partition_id] = e
        return [json.loads(e.to_json())
                for _, e in sorted(best.items())]


def run_with_checkpoints(
    partitions: Iterable[str],
    process: Callable[[str], dict],
    ledger: CheckpointLedger,
    *,
    plan: str,
    snapshot: "str | dict[str, str]",
) -> dict:
    """Drive a partition-batched run with resume. ``process(pid)`` validates
    one input partition and returns its metrics dict; completed (plan,
    snapshot, partition) triples are skipped on re-entry. Raising inside
    ``process`` records a ``failed`` attempt and re-raises (so a killed /
    crashed run leaves lineage + metrics rows intact — the resume test
    kills mid-run and restarts).

    ``snapshot`` is either one table-wide token (any data change re-runs
    everything) or a per-partition dict from
    ``sources.manifest_partitions`` — the incremental path: only
    batches whose own token has no done row run, so appends validate
    just the new files."""
    if isinstance(snapshot, dict):
        snap_of = snapshot.__getitem__
    else:
        def snap_of(_pid: str) -> str:
            return snapshot
    done = ledger.done_pairs(plan)
    skipped, ran = [], []
    for pid in partitions:
        snap = snap_of(pid)
        if (pid, snap) in done:
            skipped.append(pid)
            continue
        attempt = ledger.attempts(pid) + 1
        try:
            metrics = process(pid)
        except Exception as exc:
            ledger.record(LedgerEntry(pid, "failed", plan, snap, attempt,
                                      {"error": str(exc)[:500]}))
            raise
        ledger.record(LedgerEntry(pid, "done", plan, snap, attempt,
                                  metrics))
        ran.append(pid)
    return {"ran": ran, "skipped": skipped}
