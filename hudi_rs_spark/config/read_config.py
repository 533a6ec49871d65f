"""Read options — mirrors ReadOptions in the reference
(/root/reference/crates/core/src/config/read.rs:113-124 and
docs/reader-spec.md:47-84).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class HudiReadOptions:
    query_type: str = "snapshot"  # snapshot | incremental
    as_of_timestamp: str | None = None
    start_timestamp: str | None = None
    end_timestamp: str | None = None
    use_read_optimized_mode: bool = False
    # (field, op, value) string triples; ops: = != < <= > >= IN NOT IN
    filters: list[tuple[str, str, str]] = field(default_factory=list)
    projection: list[str] | None = None
    limit: int | None = None  # row-accurate fetch (op 21)
    # MOR log decode locality: "auto" switches to executor-side
    # (mapInPandas) when log volume warrants it; "driver"/"distributed"
    # force a path
    log_decode: str = "auto"
    input_partitions: int = 0  # 0 -> let Spark decide
    batch_size: int = 1024  # streaming read batch rows

    def validate(self) -> None:
        if self.query_type not in ("snapshot", "incremental"):
            raise ValueError(f"invalid query type: {self.query_type}")
        if self.query_type == "snapshot" and (self.start_timestamp or self.end_timestamp):
            # reference strips irrelevant timestamps (read_options.rs:247-262)
            pass
