"""Small public utilities mirrored from the reference's util module."""

from __future__ import annotations

from typing import TypeVar

T = TypeVar("T")


def split_into_chunks(items: list[T], num_splits: int) -> list[list[T]]:
    """Split ``items`` into approximately equal contiguous chunks —
    reference ``hudi::util::collection::split_into_chunks``
    (crates/core/src/util/collection.rs:37-49): callers bucket
    ``get_file_slices`` results into parallel read tasks with it
    (docs/reader-spec.md §2 notes). ``num_splits`` clamps to >= 1;
    an empty input yields no chunks."""
    if not items:
        return []
    num_splits = max(1, num_splits)
    chunk_size = -(-len(items) // num_splits)  # ceil division
    return [
        list(items[i : i + chunk_size])
        for i in range(0, len(items), chunk_size)
    ]
