"""Manifest-committed snapshot tables: transactional semantics on
plain parquet, with no table-format dependency.

The reference commits loads transactionally through an ON COMMIT DROP
staging table plus a single MERGE statement (PGHelperFunction.py:74-77,
adffunction/__init__.py:180) — readers never observe a half-applied
load. SURVEY §4 maps that contract to Delta/Iceberg MERGE; this env has
neither, so this module re-expresses the public Delta Lake idea (a log
of snapshot manifests plus an atomically-swapped current pointer —
Armbrust et al., "Delta Lake: High-Performance ACID Table Storage over
Cloud Object Stores", VLDB 2020) at its minimum viable size.

Layout:
    {table}/data/commit-{N}/part-*.parquet   immutable data files
    {table}/_manifests/v{N}.json             full file list of snapshot N
    {table}/_current                         pointer file: "N"

Commit protocol (any filesystem with atomic single-file rename):
    1. write the new data files (distributed `df.write.parquet`)
    2. write manifest v{N}.json naming the COMPLETE file set
    3. write `_current.tmp-*` and `os.rename` it over `_current`
Step 3 is the commit point. A crash before it leaves orphan data files
and possibly an orphan manifest, but `_current` still resolves to the
last complete snapshot — readers are never broken; `vacuum` removes
the orphans. Readers go pointer → manifest → explicit file list, so
they see one snapshot even while a writer is mid-commit.

Concurrent writers — version-fenced compare-and-swap (the same idea
Delta Lake's transaction log uses: the O_EXCL create of log file N IS
the lock for commit N):

    snapshot_write_cas(df, table, expected_version=P)
        commits ONLY as version P+1, and only if no other writer got
        there first. The manifest file v{P+1}.json is created with
        O_CREAT|O_EXCL — exactly one writer can own a version slot —
        and the pointer is re-checked against P immediately before the
        claim. A loser raises ConcurrentCommitError with the table
        untouched (its staged data files are orphans vacuum removes).

    snapshot_merge_cas / snapshot_apply_cdc_cas
        retry-with-REBASE helpers: on a lost race they re-read the NEW
        current snapshot, recompute the merge against it, and try the
        next slot — so a streaming CDC sink and a batch compaction job
        pointed at the same table serialize instead of last-writer-wins
        silently dropping one commit.

Why this is safe on any FS with O_EXCL + atomic rename: the pointer
can only move P→P+1 by the unique owner of slot P+1, whose result was
computed against snapshot P; a second writer that read P must lose the
O_EXCL claim on P+1 and rebase on the new current. A writer that
crashes BETWEEN claiming the slot and swapping the pointer leaves the
slot dead (indistinguishable from slow on a plain filesystem — the
classic limitation Delta solves with storage-level mutual exclusion);
`release_orphan_slot` frees it explicitly after operator review.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import tempfile
import time as _time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from azure_data_engineering_spark.operators.upsert import default_dedup_order, merge_upsert

_MANIFEST_RE = re.compile(r"v(\d+)\.json$")


def _manifest_dir(table: str) -> str:
    return os.path.join(table, "_manifests")


def _pointer_path(table: str) -> str:
    return os.path.join(table, "_current")


def snapshot_versions(table: str) -> list[int]:
    """All committed-or-orphaned manifest versions, ascending."""
    out = []
    for p in glob.glob(os.path.join(glob.escape(_manifest_dir(table)), "v*.json")):
        m = _MANIFEST_RE.search(p)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(table: str) -> int | None:
    """The committed snapshot version, or None for an empty table.
    Only the pointer decides — an orphan manifest from a crashed
    commit is invisible here."""
    try:
        with open(_pointer_path(table)) as f:
            return int(f.read().strip())
    except (FileNotFoundError, ValueError):
        return None


def _read_manifest(table: str, version: int) -> list[str]:
    with open(os.path.join(_manifest_dir(table), f"v{version}.json")) as f:
        return json.load(f)["files"]


def _commit(table: str, version: int, files: Sequence[str]) -> int:
    """Steps 2+3 of the protocol: manifest, then atomic pointer swap."""
    os.makedirs(_manifest_dir(table), exist_ok=True)
    manifest = os.path.join(_manifest_dir(table), f"v{version}.json")
    with open(manifest, "w") as f:
        json.dump({"version": version, "files": sorted(files)}, f)
    fd, tmp = tempfile.mkstemp(prefix="_current.tmp-", dir=table)
    with os.fdopen(fd, "w") as f:
        f.write(str(version))
    os.rename(tmp, _pointer_path(table))  # the commit point
    return version


def _write_data(df: DataFrame, table: str, version: int) -> list[str]:
    """Step 1: distributed write of this commit's data files; returns
    their table-relative paths."""
    commit_dir = os.path.join(table, "data", f"commit-{version}")
    df.write.parquet(commit_dir)
    return [
        os.path.relpath(p, table)
        for p in glob.glob(os.path.join(glob.escape(commit_dir), "part-*.parquet"))
    ]


class ConcurrentCommitError(RuntimeError):
    """Another writer claimed the next version slot, or the table moved
    past expected_version. The losing commit left the table untouched;
    rebase on the new current snapshot and retry."""


def _claim_tag_of(manifest: str) -> str | None:
    try:
        with open(manifest) as f:
            return json.load(f).get("claim_tag")
    except (OSError, ValueError):
        return None


def _claim_age(manifest: str) -> float | None:
    try:
        return _time.time() - os.path.getmtime(manifest)
    except OSError:
        return None


def _commit_cas(
    table: str,
    expected_version: int | None,
    files: Sequence[str],
    claim_tag: str | None = None,
    stale_claim_timeout: float | None = None,
) -> int:
    """Version-fenced commit: claim slot expected+1 via O_EXCL manifest
    create, then swap the pointer. Raises ConcurrentCommitError if the
    pointer moved or the slot is already owned.

    `claim_tag` identifies the LOGICAL work unit (e.g. "<checkpoint>
    #b<batch_id>" for a streaming sink). If the slot is already claimed
    by a manifest carrying the SAME tag, the claimant was a prior
    attempt of this very work that died between claim and pointer swap
    — the caller's execution model must guarantee a single live attempt
    per tag (Structured Streaming does, per query+batch; the same
    invariant Spark's own FileStreamSink batch-manifest commit relies
    on) — so the slot is RECLAIMED by an atomic manifest replace.

    `stale_claim_timeout` (seconds) is the age-based orphan policy for
    FOREIGN claims: a claim manifest older than the timeout whose slot
    never reached the pointer is treated as a dead writer and reclaimed
    automatically — a crashed streaming sink can no longer wedge the
    table until a human calls release_orphan_slot. UNSAFE WINDOW
    (inherent to a plain filesystem, where dead and slow are
    indistinguishable): if the original claimant is merely stalled
    longer than the timeout and wakes up mid-reclaim, one of the two
    commits can be lost — set the timeout to many multiples of the
    slowest plausible claim-to-pointer-swap stall (the write itself
    happens BEFORE the claim, so this gap is milliseconds of pointer
    bookkeeping, not data-write time). The reclaim shrinks the race to
    one pointer re-check: the displaced manifest is saved first and
    atomically restored if the pointer moved mid-reclaim. None
    (default) keeps the strict behavior: dead foreign slots block
    until release_orphan_slot."""
    cur = current_version(table)
    if cur != expected_version:
        raise ConcurrentCommitError(
            f"{table}: expected version {expected_version}, found {cur} "
            "(another writer committed first — rebase and retry)"
        )
    version = (expected_version or 0) + 1
    os.makedirs(_manifest_dir(table), exist_ok=True)
    manifest = os.path.join(_manifest_dir(table), f"v{version}.json")
    payload: dict = {"version": version, "files": sorted(files)}
    if claim_tag is not None:
        payload["claim_tag"] = claim_tag

    def _replace_manifest() -> None:
        fd2, tmp = tempfile.mkstemp(prefix="_reclaim.tmp-", dir=table)
        with os.fdopen(fd2, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, manifest)

    try:
        fd = os.open(manifest, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        age = _claim_age(manifest)
        if claim_tag is not None and _claim_tag_of(manifest) == claim_tag:
            _replace_manifest()  # reclaim our own dead attempt
        elif (
            stale_claim_timeout is not None
            and age is not None
            and age > stale_claim_timeout
        ):
            # age-based orphan reclaim: save the displaced claim so the
            # residual stalled-not-dead race can be rolled back
            try:
                with open(manifest, "rb") as f:
                    displaced = f.read()
            except OSError:
                displaced = None
            # Reject reclaim if the slot's version already reached the
            # pointer: overwriting a COMMITTED manifest, even briefly,
            # would serve readers the reclaimer's file list under the
            # claimant's committed version (ADVICE r10). Only an
            # uncommitted orphan may be displaced.
            if current_version(table) != expected_version:
                raise ConcurrentCommitError(
                    f"{table}: v{version} committed while evaluating "
                    "stale-claim reclaim — rebase and retry"
                ) from None
            _replace_manifest()
            if current_version(table) != expected_version:
                # the claimant committed between our fence check and the
                # replace — restore its manifest and lose the race
                if displaced is not None:
                    fd3, tmp3 = tempfile.mkstemp(prefix="_restore.tmp-", dir=table)
                    with os.fdopen(fd3, "wb") as f:
                        f.write(displaced)
                    os.replace(tmp3, manifest)
                raise ConcurrentCommitError(
                    f"{table}: stale-claim reclaim of v{version} lost to the "
                    "original claimant waking up — rebase and retry"
                ) from None
        else:
            raise ConcurrentCommitError(
                f"{table}: version slot v{version} is already claimed "
                "(a concurrent writer owns it, or a crashed commit left an "
                "orphan slot — see release_orphan_slot, or pass "
                "stale_claim_timeout for age-based auto-reclaim)"
            ) from None
    else:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
    fd2, tmp = tempfile.mkstemp(prefix="_current.tmp-", dir=table)
    with os.fdopen(fd2, "w") as f:
        f.write(str(version))
    os.rename(tmp, _pointer_path(table))  # the commit point
    return version


def _write_data_unique(df: DataFrame, table: str, version: int) -> list[str]:
    """CAS step 1: stage data files under a per-ATTEMPT unique dir so
    two racers for the same slot never collide on a directory; the
    loser's files are orphans vacuum removes."""
    commit_dir = tempfile.mkdtemp(
        prefix=f"commit-{version}-", dir=_ensure_data_root(table)
    )
    os.rmdir(commit_dir)  # parquet writer wants to create it itself
    df.write.parquet(commit_dir)
    return [
        os.path.relpath(p, table)
        for p in glob.glob(os.path.join(glob.escape(commit_dir), "part-*.parquet"))
    ]


def _ensure_data_root(table: str) -> str:
    root = os.path.join(table, "data")
    os.makedirs(root, exist_ok=True)
    return root


def snapshot_write_cas(
    df: DataFrame,
    table: str,
    expected_version: int | None,
    mode: str = "overwrite",
    claim_tag: str | None = None,
    stale_claim_timeout: float | None = None,
) -> int:
    """Commit df as version expected+1 IFF the table is still at
    `expected_version` (None = must still be empty) and no concurrent
    writer owns that slot. Raises ConcurrentCommitError on a lost race
    — the table is untouched and the caller must rebase (re-read the
    new current snapshot, recompute, retry). `stale_claim_timeout`
    enables age-based reclaim of a dead writer's orphan slot — see
    _commit_cas for the policy and its documented unsafe window."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    os.makedirs(table, exist_ok=True)
    version = (expected_version or 0) + 1
    files = _write_data_unique(df, table, version)
    if mode == "append" and expected_version is not None:
        files = list(_read_manifest(table, expected_version)) + files
    return _commit_cas(
        table,
        expected_version,
        files,
        claim_tag=claim_tag,
        stale_claim_timeout=stale_claim_timeout,
    )


def snapshot_merge_cas(
    source: DataFrame,
    table: str,
    pk: Sequence[str],
    dedup_order: Sequence | None = None,
    max_retries: int = 5,
    claim_tag: str | None = None,
    stale_claim_timeout: float | None = None,
) -> int:
    """snapshot_merge with retry-and-REBASE under contention: each
    attempt reads the CURRENT snapshot, computes the merge against it,
    and commits with that version as the fence — a lost race recomputes
    against the winner's result instead of silently overwriting it.
    This is the commit discipline a streaming CDC sink and a batch
    compaction job need to share one table."""
    spark = source.sparkSession
    order = (
        list(dedup_order)
        if dedup_order is not None
        else default_dedup_order(source.columns, pk)
    )
    last: ConcurrentCommitError | None = None
    for _ in range(max_retries):
        expected = current_version(table)
        if expected is None:
            from azure_data_engineering_spark.operators.relational import (
                dedup_keep_first,
            )

            merged = dedup_keep_first(source, pk, order)
        else:
            target = snapshot_read(spark, table, version=expected)
            merged = merge_upsert(target, source, pk, dedup_order=order)
        try:
            return snapshot_write_cas(
                merged,
                table,
                expected,
                mode="overwrite",
                claim_tag=claim_tag,
                stale_claim_timeout=stale_claim_timeout,
            )
        except ConcurrentCommitError as exc:
            last = exc
            continue
    raise ConcurrentCommitError(
        f"{table}: lost {max_retries} consecutive commit races"
    ) from last


def snapshot_apply_cdc_cas(
    changes: DataFrame,
    table: str,
    pk: Sequence[str],
    op_col: str = "op",
    dedup_order: Sequence | None = None,
    max_retries: int = 5,
    claim_tag: str | None = None,
    stale_claim_timeout: float | None = None,
) -> int:
    """snapshot_apply_cdc with the same retry-and-rebase CAS discipline
    as snapshot_merge_cas — the changelog batch re-applies cleanly
    against whatever snapshot won the race, because I/U/D application
    is computed fresh from the current table on every attempt."""
    from azure_data_engineering_spark.operators.upsert import apply_cdc

    spark = changes.sparkSession
    payload = [c for c in changes.columns if c != op_col]
    order = (
        list(dedup_order)
        if dedup_order is not None
        else default_dedup_order(payload, pk)
    )
    last: ConcurrentCommitError | None = None
    for _ in range(max_retries):
        expected = current_version(table)
        if expected is None:
            target = spark.createDataFrame([], changes.select(*payload).schema)
        else:
            target = snapshot_read(spark, table, version=expected)
        applied = apply_cdc(target, changes, pk, op_col=op_col, dedup_order=order)
        try:
            return snapshot_write_cas(
                applied,
                table,
                expected,
                mode="overwrite",
                claim_tag=claim_tag,
                stale_claim_timeout=stale_claim_timeout,
            )
        except ConcurrentCommitError as exc:
            last = exc
            continue
    raise ConcurrentCommitError(
        f"{table}: lost {max_retries} consecutive commit races"
    ) from last


def release_orphan_slot(table: str, version: int) -> None:
    """Free a version slot claimed by a writer that died between the
    O_EXCL manifest create and the pointer swap. DESTRUCTIVE if the
    writer is merely slow — on a plain filesystem dead and slow are
    indistinguishable (the limitation real table formats solve with
    storage-level mutual exclusion), so this is an explicit operator
    action, never called automatically. Refuses to touch a committed
    version."""
    cur = current_version(table)
    if cur is not None and version <= cur:
        raise ValueError(
            f"v{version} is committed (current is v{cur}); refusing to release"
        )
    manifest = os.path.join(_manifest_dir(table), f"v{version}.json")
    if os.path.exists(manifest):
        os.remove(manifest)


def snapshot_write(df: DataFrame, table: str, mode: str = "overwrite") -> int:
    """Commit df as the next snapshot. `overwrite` replaces the file
    set; `append` unions the previous snapshot's files with the new
    ones — an O(new data) commit, no rewrite of existing files."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    os.makedirs(table, exist_ok=True)
    prev = current_version(table)
    # next version past BOTH the pointer and any orphan manifest a
    # crashed commit left behind, so the orphan is never overwritten
    version = max([0, *snapshot_versions(table), prev or 0]) + 1
    files = _write_data(df, table, version)
    if mode == "append" and prev is not None:
        files = list(_read_manifest(table, prev)) + files
    return _commit(table, version, files)


def snapshot_read(spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
    """The table at a snapshot (default: current) — time travel is just
    reading an older manifest. The scan gets an explicit file list, so
    a concurrent in-flight commit can never leak half its files in."""
    v = current_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"no committed snapshot at {table}")
    files = [os.path.join(table, rel) for rel in _read_manifest(table, v)]
    return spark.read.parquet(*files)


def snapshot_merge(
    source: DataFrame,
    table: str,
    pk: Sequence[str],
    dedup_order: Sequence | None = None,
) -> int:
    """MERGE source into the table as one atomic commit: read the
    current snapshot, apply merge_upsert (update-matched /
    insert-unmatched / deterministic in-source dedup), write the result
    as the next snapshot. Readers see the pre-merge table until the
    pointer swaps — the reference's staging-then-single-MERGE contract
    (PGHelperFunction.py:74-77) on files. First merge into an empty
    table degenerates to an overwrite commit of the deduped source."""
    spark = source.sparkSession
    order = list(dedup_order) if dedup_order is not None else default_dedup_order(source.columns, pk)
    if current_version(table) is None:
        from azure_data_engineering_spark.operators.relational import dedup_keep_first

        return snapshot_write(dedup_keep_first(source, pk, order), table, mode="overwrite")
    target = snapshot_read(spark, table)
    merged = merge_upsert(target, source, pk, dedup_order=order)
    return snapshot_write(merged, table, mode="overwrite")


def snapshot_apply_cdc(
    changes: DataFrame,
    table: str,
    pk: Sequence[str],
    op_col: str = "op",
    dedup_order: Sequence | None = None,
) -> int:
    """Apply an I/U/D changelog batch to the table as one atomic
    commit (operators/upsert.apply_cdc semantics: upserts merge,
    deletes remove the key, same-batch conflicts resolve by
    dedup_order with the winner's op deciding). The delete-capable
    sibling of snapshot_merge; an all-delete first batch on an empty
    table commits an empty snapshot."""
    from azure_data_engineering_spark.operators.upsert import apply_cdc

    spark = changes.sparkSession
    payload = [c for c in changes.columns if c != op_col]
    order = list(dedup_order) if dedup_order is not None else default_dedup_order(payload, pk)
    if current_version(table) is None:
        target = spark.createDataFrame([], changes.select(*payload).schema)
    else:
        target = snapshot_read(spark, table)
    applied = apply_cdc(target, changes, pk, op_col=op_col, dedup_order=order)
    return snapshot_write(applied, table, mode="overwrite")


def snapshot_diff(
    spark: SparkSession,
    table: str,
    from_version: int,
    to_version: int,
    pk: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Change-data-feed between two committed snapshots: the I/U/D
    changelog that replays `from_version` into `to_version` — the
    inverse of snapshot_apply_cdc, and the piece that lets a
    downstream consumer (another table, a JDBC sink, a cache)
    incrementally follow a snapshot table it cannot tail.

    One full outer join on pk: keys only in `to` emit I with the new
    payload; only in `from` emit D (payload = old row, matching the
    delete rows streaming/sinks.py produces); present in both emit U
    iff any payload column differs — compared as a struct equality,
    which is null-safe per field and needs no per-column codegen
    explosion. Unchanged keys emit nothing, so the feed is O(changed)
    rows regardless of table size; the join shuffles on pk exactly
    like the MERGE that produced the versions."""
    old = snapshot_read(spark, table, version=from_version)
    new = snapshot_read(spark, table, version=to_version)
    if set(old.columns) != set(new.columns):
        raise ValueError(
            f"snapshot_diff: schema changed between v{from_version} and "
            f"v{to_version}; diff requires a stable column set"
        )
    payload = [c for c in new.columns if c not in pk]
    o = old.select(
        *[F.col(c).alias(f"__o_{c}") for c in old.columns],
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"__n_{c}") for c in new.columns],
        F.lit(True).alias("__in_new"),
    )
    cond = None
    for c in pk:
        eq = o[f"__o_{c}"].eqNullSafe(n[f"__n_{c}"])
        cond = eq if cond is None else (cond & eq)
    joined = o.join(n, cond, "full_outer")
    changed = ~F.struct(*[F.col(f"__o_{c}") for c in payload]).eqNullSafe(
        F.struct(*[F.col(f"__n_{c}") for c in payload])
    )
    op = (
        F.when(F.col("__in_old").isNull(), F.lit("I"))
        .when(F.col("__in_new").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    out_cols = [
        F.coalesce(F.col(f"__n_{c}"), F.col(f"__o_{c}")).alias(c)
        for c in pk
    ] + [
        F.when(F.col("__in_new").isNull(), F.col(f"__o_{c}"))
        .otherwise(F.col(f"__n_{c}"))
        .alias(c)
        for c in payload
    ]
    return (
        joined.withColumn(op_col, op)
        .filter(F.col(op_col).isNotNull())
        .select(op_col, *out_cols)
    )


def vacuum(table: str, keep_last: int = 1) -> int:
    """Drop manifests older than the newest `keep_last` (never the
    current pointer's) and every data file no kept manifest references
    — including files orphaned by crashed commits. Returns the number
    of data files deleted."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snapshot_versions(table)
    cur = current_version(table)
    keep = set(versions[-keep_last:])
    if cur is not None:
        keep.add(cur)
    referenced: set[str] = set()
    for v in sorted(keep):
        if os.path.exists(os.path.join(_manifest_dir(table), f"v{v}.json")):
            referenced.update(_read_manifest(table, v))
    removed = 0
    for v in versions:
        if v not in keep:
            os.remove(os.path.join(_manifest_dir(table), f"v{v}.json"))
    data_root = os.path.join(table, "data")
    for p in glob.glob(os.path.join(glob.escape(data_root), "commit-*", "*.parquet")):
        if os.path.relpath(p, table) not in referenced:
            os.remove(p)
            removed += 1
    for d in glob.glob(os.path.join(glob.escape(data_root), "commit-*")):
        if not os.listdir(d):
            shutil.rmtree(d, ignore_errors=True)
    return removed
