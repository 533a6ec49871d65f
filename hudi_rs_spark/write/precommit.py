"""Pre-commit validators — Hudi's ``hoodie.precommit.validators``
family (SqlQueryEqualityPreCommitValidator /
SqlQuerySingleResultPreCommitValidator /
SqlQueryInequalityPreCommitValidator): data-quality gates an ingest
must pass before its commit is allowed to stand.

Each validator is a SQL query over the placeholder ``<TABLE>``:

- ``equality``: the query must return IDENTICAL rows evaluated against
  the table BEFORE and AFTER the write (e.g. ``SELECT count(*) FROM
  <TABLE> WHERE lang = 'de'`` — prove the write didn't touch another
  tenant's partition).
- ``inequality``: the results must DIFFER (prove the write actually
  changed what it claimed to).
- ``single``: ``<query>#<expected>`` — the first column of the first
  row must stringify to ``expected`` (e.g. ``SELECT count(*) FROM
  <TABLE> WHERE text IS NULL#0``).

Execution model: this engine validates AFTER the instant lands and
REWINDS it on failure (restore to the pre-write instant, then raise
``PreCommitValidationError``). Hudi proper gates the publish itself;
the difference is a short window where a concurrent reader could see
the about-to-be-rewound instant — the single-writer outcome is
identical, and both sides of every check read through ONE planner pass
each (before = time travel to the pre-write instant, after = current
snapshot), so the gate costs two bounded queries, not a table copy.
"""

from __future__ import annotations


class PreCommitValidationError(RuntimeError):
    """A pre-commit validator rejected the write (already rewound)."""


_PLACEHOLDER = "<TABLE>"


def extract_validator_options(options: dict) -> dict:
    """Pull ``precommit.validator.{equality,single,inequality}.sql``
    (also accepted with the ``hoodie.`` prefix) out of write options;
    each accepts one query or several separated by ``;;``."""
    out: dict[str, list[str]] = {}
    for kind in ("equality", "single", "inequality"):
        for key in (
            f"precommit.validator.{kind}.sql",
            f"hoodie.precommit.validators.{kind}.sql",
        ):
            raw = options.get(key)
            if raw:
                out.setdefault(kind, []).extend(
                    q.strip() for q in str(raw).split(";;") if q.strip()
                )
    return out


def _run(spark, sql: str, view: str):
    return spark.sql(sql.replace(_PLACEHOLDER, view))


def _digest(df) -> tuple:
    """(row count, order-insensitive hash sum) of a validator query's
    result — ONE distributed aggregate, two scalars to the driver, so a
    validator over a 100 TB scope costs a scan + partial agg, never a
    collect. Column order is normalized by name so `SELECT a, b` and
    `SELECT b, a` digest identically."""
    from pyspark.sql import functions as F

    cols = sorted(df.columns)
    h = F.xxhash64(
        *[F.coalesce(F.col(c).cast("string"), F.lit("\0null")) for c in cols]
    )
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(h.cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return (row.n, row.s)


def run_precommit_validators(
    spark,
    path: str,
    validators: dict,
    before_instant: str | None,
) -> list[str]:
    """Evaluate every validator; returns the list of failure messages
    (empty = all green). Raises nothing itself — the caller decides to
    rewind."""
    from hudi_rs_spark.config.read_config import HudiReadOptions
    from hudi_rs_spark.sources.hudi import HudiTable

    t = HudiTable(path, spark)
    after = t.read()
    after.createOrReplaceTempView("__hudi_precommit_after")
    needs_before = validators.get("equality") or validators.get("inequality")
    if needs_before:
        if before_instant is None:
            raise ValueError(
                "equality/inequality validators need the pre-write instant"
            )
        before = t.read(HudiReadOptions(as_of_timestamp=before_instant))
        before.createOrReplaceTempView("__hudi_precommit_before")
    problems: list[str] = []
    for sql in validators.get("equality", ()):
        b = _digest(_run(spark, sql, "__hudi_precommit_before"))
        a = _digest(_run(spark, sql, "__hudi_precommit_after"))
        if a != b:
            problems.append(
                f"equality validator changed: {sql!r} (before "
                f"rows={b[0]}, after rows={a[0]})"
            )
    for sql in validators.get("inequality", ()):
        b = _digest(_run(spark, sql, "__hudi_precommit_before"))
        a = _digest(_run(spark, sql, "__hudi_precommit_after"))
        if a == b:
            problems.append(
                f"inequality validator did not change: {sql!r} "
                f"(rows={a[0]})"
            )
    for spec in validators.get("single", ()):
        sql, sep, expected = spec.rpartition("#")
        if not sep or not sql.strip():
            problems.append(
                f"malformed single validator {spec!r}: expected "
                "'<query>#<expected>'"
            )
            continue
        # the contract is a single-row result: limit(2) bounds the
        # driver-side materialization at ANY table scale and lets us
        # flag a >1-row validator as malformed instead of silently
        # checking row 0 of an unbounded collect
        got = _run(spark, sql.strip(), "__hudi_precommit_after").limit(2).collect()
        if len(got) > 1:
            problems.append(
                f"malformed single validator {sql.strip()!r}: query "
                "returned more than one row"
            )
            continue
        val = str(got[0][0]) if got else None
        if val != expected.strip():
            problems.append(
                f"single-result validator: {sql.strip()!r} returned "
                f"{val!r}, expected {expected.strip()!r}"
            )
    return problems


def enforce_precommit(
    spark, path: str, validators: dict, before_instant: str | None
) -> None:
    """Run validators; on any failure rewind the table to
    ``before_instant`` and raise PreCommitValidationError."""
    problems = run_precommit_validators(
        spark, path, validators, before_instant
    )
    if not problems:
        return
    from hudi_rs_spark.write.savepoint import restore

    if before_instant is not None:
        restore(path, before_instant, force=True)
    raise PreCommitValidationError(
        "write rejected and rewound: " + "; ".join(problems)
    )
