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

    # -- fluent builders (reference HudiReadOptions.with_*,
    # python/hudi/_internal.pyi:67-79) — each returns a COPY so a base
    # options object can be reused across queries
    def _with(self, **kw) -> "HudiReadOptions":
        from dataclasses import replace

        return replace(self, **kw)

    def with_query_type(self, query_type: str) -> "HudiReadOptions":
        return self._with(query_type=query_type)

    def with_as_of_timestamp(self, timestamp: str) -> "HudiReadOptions":
        return self._with(as_of_timestamp=timestamp)

    def with_start_timestamp(self, timestamp: str) -> "HudiReadOptions":
        return self._with(start_timestamp=timestamp)

    def with_end_timestamp(self, timestamp: str) -> "HudiReadOptions":
        return self._with(end_timestamp=timestamp)

    def with_batch_size(self, size: int) -> "HudiReadOptions":
        return self._with(batch_size=size)

    def with_filters(
        self, filters: list[tuple[str, str, str]]
    ) -> "HudiReadOptions":
        return self._with(filters=list(filters))

    def with_projection(self, columns: list[str]) -> "HudiReadOptions":
        return self._with(projection=list(columns))

    def with_limit(self, limit: int) -> "HudiReadOptions":
        return self._with(limit=limit)
