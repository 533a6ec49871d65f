"""Compaction plan strategies — Hudi's ``hoodie.compaction.strategy``
family. At 100 TB "compact everything with logs" is not an operation
you can run: a strategy bounds each compaction round so it fits an IO
budget / freshness target, and the rest waits for the next round.

Four strategies (names accept the Hudi class name or the short form):

- ``unbounded`` (UnBoundedCompactionStrategy): every dirty slice — the
  previous behavior, still the default.
- ``log_file_size`` (LogFileSizeBasedCompactionStrategy): dirty slices
  ordered by total log bytes DESC (most read-amplified first), taken
  until the IO budget is spent — each round buys the most merge-cost
  reduction per IO spent.
- ``bounded_io`` (BoundedIOCompactionStrategy): planner order, stop at
  the IO budget — predictable round cost without reordering.
- ``day_based`` (DayBasedCompactionStrategy): only the latest
  ``target_partitions`` partitions (lexicographically greatest paths —
  date-style layouts sort newest-last), matching Hudi's
  targetPartitionsPerDayBasedCompaction. Freshness-first for
  time-partitioned tables where old partitions stop changing.

IO estimate per slice (Hudi's CompactionOperation cost model,
approximated): read = base + logs, write ≈ merged base ≈ base + logs,
so ``io ≈ 2·(base_bytes + log_bytes)``. Sizes come from the listing
the planner already holds — the selection is pure driver-side
arithmetic, zero extra storage I/O.

A budget always admits at least one slice (a single slice larger than
the budget must still compact eventually — Hudi does the same).
"""

from __future__ import annotations

_STRATEGIES = ("unbounded", "log_file_size", "bounded_io", "day_based")


def normalize_strategy(raw: str) -> str:
    v = str(raw or "unbounded").strip().lower()
    aliases = {
        "unbounded": "unbounded",
        "unboundedcompactionstrategy": "unbounded",
        "log_file_size": "log_file_size",
        "logfilesize": "log_file_size",
        "logfilesizebasedcompactionstrategy": "log_file_size",
        "bounded_io": "bounded_io",
        "boundedio": "bounded_io",
        "boundediocompactionstrategy": "bounded_io",
        "day_based": "day_based",
        "daybased": "day_based",
        "daybasedcompactionstrategy": "day_based",
    }
    key = v.rsplit(".", 1)[-1].replace("_", "") if "." in v else v
    out = aliases.get(v) or aliases.get(key)
    if out is None:
        raise ValueError(
            f"unknown compaction strategy {raw!r}; expected one of "
            f"{_STRATEGIES} (or the Hudi class names)"
        )
    return out


def _slice_io_bytes(sl) -> int:
    base = sl.base_file.size if sl.base_file is not None else 0
    logs = sum(lf.size for lf in sl.log_files)
    return 2 * (base + logs)


def _log_bytes(sl) -> int:
    return sum(lf.size for lf in sl.log_files)


def select_compaction_slices(
    slices,
    strategy: str = "unbounded",
    target_io_mb: float | None = None,
    target_partitions: int = 10,
):
    """Subset of ``slices`` (FileSlice objects with logs) this round
    should compact, per the strategy. Returns a list in selection
    order."""
    strategy = normalize_strategy(strategy)
    slices = list(slices)
    if strategy == "unbounded":
        return slices
    if strategy == "day_based":
        parts = sorted({sl.partition_path or "" for sl in slices},
                       reverse=True)
        chosen = set(parts[: max(1, int(target_partitions))])
        return [sl for sl in slices if (sl.partition_path or "") in chosen]
    # IO-bounded strategies
    if target_io_mb is None:
        raise ValueError(f"strategy {strategy!r} needs target_io_mb")
    budget = float(target_io_mb) * 1024 * 1024
    ordered = (
        sorted(slices, key=_log_bytes, reverse=True)
        if strategy == "log_file_size"
        else slices
    )
    out, spent = [], 0.0
    for sl in ordered:
        cost = _slice_io_bytes(sl)
        if out and spent + cost > budget:
            if strategy == "bounded_io":
                break  # planner order: stop at the budget edge
            continue  # size-ordered: a smaller slice may still fit
        out.append(sl)
        spent += cost
        if spent >= budget:
            break
    return out
