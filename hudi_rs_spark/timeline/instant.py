"""Timeline instants — re-expresses
/root/reference/crates/core/src/timeline/instant.rs:107-115 (parse) and
timeline/selector.rs:145-171 (layout 1 vs layout 2 filename formats).
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from datetime import datetime, timezone

EARLIEST_START_TIMESTAMP = "19700101000000000"  # timeline/mod.rs:62


class Action(enum.Enum):
    COMMIT = "commit"
    DELTA_COMMIT = "deltacommit"
    REPLACE_COMMIT = "replacecommit"


class State(enum.IntEnum):
    REQUESTED = 0
    INFLIGHT = 1
    COMPLETED = 2


def parse_hudi_timestamp_millis(ts: str) -> int:
    """yyyyMMddHHmmss[SSS] (UTC) or 17-digit epoch-millis fallback
    (instant.rs parse_datetime)."""
    if len(ts) not in (14, 17):
        raise ValueError(f"bad hudi timestamp: {ts}")
    try:
        base = datetime.strptime(ts[:14], "%Y%m%d%H%M%S").replace(tzinfo=timezone.utc)
        millis = int(ts[14:17]) if len(ts) == 17 else 0
        return int(base.timestamp() * 1000) + millis
    except ValueError:
        if len(ts) == 17 and ts.isdigit():
            return int(ts)
        raise


@dataclass(frozen=True)
class Instant:
    timestamp: str  # requested timestamp (ordering key)
    action: Action
    state: State
    completion_timestamp: str | None = None  # v8+ completed only

    @property
    def epoch_millis(self) -> int:
        return parse_hudi_timestamp_millis(self.timestamp)

    @property
    def is_completed(self) -> bool:
        return self.state == State.COMPLETED

    @property
    def is_replacecommit(self) -> bool:
        return self.action == Action.REPLACE_COMMIT

    def sort_key(self) -> tuple[int, int]:
        return (self.epoch_millis, int(self.state))

    @classmethod
    def from_file_name(cls, file_name: str) -> "Instant":
        ts_part, _, action_suffix = file_name.partition(".")
        if not action_suffix:
            raise ValueError(f"invalid instant file name: {file_name}")
        action, state = _parse_action_and_state(action_suffix)
        if "_" in ts_part:
            requested, completed = ts_part.split("_", 1)
            if state != State.COMPLETED:
                raise ValueError(f"underscore format requires completed state: {file_name}")
            _validate(requested)
            _validate(completed)
            return cls(requested, action, state, completed)
        _validate(ts_part)
        return cls(ts_part, action, state)


def _validate(ts: str) -> None:
    if len(ts) not in (14, 17):
        raise ValueError(f"bad timestamp length: {ts}")
    parse_hudi_timestamp_millis(ts)


def _parse_action_and_state(suffix: str) -> tuple[Action, State]:
    action_str, _, state_str = suffix.partition(".")
    if action_str == "compaction":
        # Hudi names a SCHEDULED compaction {ts}.compaction.requested /
        # .inflight; on completion it publishes as {ts}.commit. The
        # reference's Action enum has no compaction variant
        # (instant.rs:30-34 — its loader skips these files), but parsing
        # the pending states as pending COMMITs is load-bearing here:
        # the marker is what keeps the scheduled instant pending (logs
        # anchored at it stay associated, archival stays pinned).
        return Action.COMMIT, _state_from(state_str)
    if action_str == "clustering":
        # Hudi 1.0's scheduled-clustering marker: pending states are
        # {ts}.clustering.requested/.inflight, completion publishes as
        # {ts}.replacecommit (write/async_cluster.py). Parsing the
        # pending states keeps the scheduled instant PENDING for the
        # same reasons as compaction above.
        return Action.REPLACE_COMMIT, _state_from(state_str)
    if state_str:
        return Action(action_str), _state_from(state_str)
    if suffix == "inflight":  # commit inflight has no action part
        return Action.COMMIT, State.INFLIGHT
    return Action(suffix), State.COMPLETED


def _state_from(s: str) -> State:
    return {"requested": State.REQUESTED, "inflight": State.INFLIGHT}[s]
