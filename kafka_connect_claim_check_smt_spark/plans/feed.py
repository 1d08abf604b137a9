"""ChangeFeedConsumer — durable consumer-group offsets over the change data
feed (≙ Kafka consumer groups / Delta streaming's per-query CDF checkpoint).

``LakeTable.read_changes(from, to)`` gives any span of the net row-level
delta; what a downstream materializer (an IVM view, a search indexer, a
replica) additionally needs is the Kafka-shaped contract around it:

- a **named, durable position** per consumer, independent of other consumers
  of the same table;
- **poll → process → commit** with at-least-once delivery and exactly-once
  EFFECT when the processing is idempotent or transactional (the same
  guarantee Structured Streaming's foreachBatch gives): a crash between poll
  and commit re-polls the SAME span, never skips one;
- correct behavior at **relayout boundaries**: a ``rebucket()`` commit
  changes zero logical rows, so the consumer silently advances across it; a
  ``resolve_lww`` compaction DID change logical rows outside the feed, so the
  consumer refuses loudly (the operator contract says merge-ingest tables —
  CDF's domain — never need one);
- correct behavior under **rollback**: the restore commit is just another
  span — the consumer sees the net retraction of the bad rows and converges
  with the table, no reset needed.

Scale: the offset file is one JSON per consumer in the table's ``_consumers``
directory — O(1) bytes, atomic-replace durability (single owner per consumer
id, like a Kafka group member). The poll itself is ``read_changes``, which
prunes both snapshot sides to the buckets the span's epochs touched, so a
caught-up consumer at 10^10 rows pays per-delta, never per-table.
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame

from ..errors import ClaimCheckError, ExpiredVersionError
from .lake import LakeTable


class ChangeFeedConsumer:
    """Poll/commit cursor over a :class:`LakeTable`'s change data feed.

    Usage::

        c = ChangeFeedConsumer(table, "search-indexer")
        batch = c.poll()
        while batch is not None:
            changes, upto = batch
            apply(changes)          # idempotent / transactional
            c.commit(upto)          # durable; crash before this re-polls
            batch = c.poll()
    """

    def __init__(self, table: LakeTable, consumer_id: str):
        if not consumer_id or "/" in consumer_id or consumer_id.startswith("."):
            raise ClaimCheckError(f"invalid consumer_id {consumer_id!r}")
        self.table = table
        self.consumer_id = consumer_id
        self._dir = Path(table.root) / "_consumers"

    def _path(self) -> Path:
        return self._dir / f"{self.consumer_id}.json"

    def position(self) -> int:
        """Last committed version; 0 = consume from the beginning."""
        p = self._path()
        if not p.exists():
            return 0
        return int(json.loads(p.read_text())["version"])

    def poll(self, max_versions: int | None = None) -> tuple[DataFrame, int] | None:
        """Next unconsumed span as ``(changes_df, upto_version)``, or ``None``
        when caught up. Does NOT advance the position — :meth:`commit` does.

        ``max_versions`` bounds the span (smaller replays after a crash);
        the span is additionally cut at the first resolving boundary:
        a ``rebucket`` version is skipped as a logical no-op (commit advances
        past it), a ``resolve_lww`` version raises — logical rows changed
        outside the feed and the consumer's materialization is stale beyond
        repair; rebuild it from a snapshot read."""
        pos = self.position()
        head = self.table.current_version()
        if pos >= head:
            return None
        to = head if max_versions is None else min(head, pos + max_versions)
        while True:
            # same fell-behind contract as read_changes below: the boundary
            # scan reads manifest(to), which may itself be expired when
            # max_versions cuts `to` below the retention cutoff (round-5
            # ADVICE, low) — surface the actionable rebuild guidance, not a
            # raw ExpiredVersionError.
            try:
                boundaries = self.table.resolving_versions(pos, to)
            except ExpiredVersionError as e:
                raise self._fell_behind(pos) from e
            if not boundaries:
                break
            v, kind = boundaries[0]
            if v == pos + 1:
                if kind == "rebucket":
                    # pure relayout adjacent to the cursor: zero logical
                    # rows changed — durably advance past it and look again
                    # (crash safety: re-running reaches the same conclusion)
                    self.commit(v)
                    pos = v
                    if pos >= head:
                        return None
                    to = head if max_versions is None else min(head, pos + max_versions)
                    continue
                # resolve_lww: duplicate-key rows were collapsed outside the
                # feed. rollback_over_relayout: a rollback retracted rows AND
                # remapped bucket ids, so the retraction span cannot be
                # diffed. Either way the downstream materialization cannot be
                # repaired incrementally — never skip silently.
                raise ClaimCheckError(
                    f"change feed for consumer {self.consumer_id!r} crosses a "
                    f"{kind} boundary at version {v}: logical rows changed in "
                    "a way the feed cannot express. Rebuild the downstream "
                    "materialization from read() at the current version, then "
                    f"commit({self.table.current_version()}) to resume the "
                    "feed past the boundary."
                )
            # cut the span just before the boundary — and RE-CHECK on the cut
            # manifest: a rollback's excluded version ranges hide the dead
            # span's interior boundaries from the HEAD manifest, but
            # read_changes(pos, to) classifies on manifest(to), which still
            # sees them. The loop terminates: `to` strictly decreases (or
            # `pos` strictly advances in the skip branch above).
            to = v - 1
        try:
            changes = self.table.read_changes(pos, to)
        except ExpiredVersionError as e:
            raise self._fell_behind(pos) from e
        return changes, to

    def _fell_behind(self, pos: int) -> ClaimCheckError:
        """The Kafka offset-out-of-range analog: the consumer fell behind
        the expire_versions retention window, so a manifest its span needs
        no longer exists. current_version() is re-read here — a concurrent
        commit since poll started would make a captured ``head`` a stale
        rebuild/commit target."""
        return ClaimCheckError(
            f"consumer {self.consumer_id!r} fell behind the "
            f"expire_versions retention window (position {pos} is "
            "expired). Rebuild the downstream materialization from "
            f"read() at the current version, then "
            f"commit({self.table.current_version()}) to resume the feed "
            "inside the retained window."
        )

    def commit(self, version: int) -> None:
        """Durably advance to ``version`` (atomic tempfile + os.replace, the
        same pattern as the table's ``_latest`` pointer). Monotonic: moving
        backwards is refused — feed a fresh consumer_id to re-consume."""
        pos = self.position()
        if version < pos:
            raise ClaimCheckError(
                f"consumer {self.consumer_id!r} cannot move backwards "
                f"({pos} -> {version}); use a new consumer_id to re-consume"
            )
        head = self.table.current_version()
        if version > head:
            raise ClaimCheckError(
                f"cannot commit version {version}: table is at {head}"
            )
        self._dir.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=self._dir, prefix=f".{self.consumer_id}-")
        with os.fdopen(fd, "w") as f:
            f.write(json.dumps({"version": version, "consumer_id": self.consumer_id}))
        os.replace(tmp, self._path())
