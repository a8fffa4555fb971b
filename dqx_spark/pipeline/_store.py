"""Generic versioned-store discipline shared by the persisted index
families (dedup_index, similarity's ANN/LSH layouts).

The ``compact_*`` functions all write to a NEW path by design (Spark
cannot atomically overwrite a directory it is reading), which leaves
"which path is current?" to the operator.  A store root makes that
bookkeeping first-class: versioned index dirs ``v0, v1, ...`` plus a
1-line ``_current`` pointer file naming the active one, with the pointer
flipped only AFTER the new version's sidecar (its commit point) landed.

Crash semantics, in order of what a crash can leave behind:

* mid-compaction (dst partially written, sidecar absent): the pointer
  still names the old version; the partial dir is ignored by resolution
  (no sidecar = not a version) and the next compaction picks a FRESH
  number past it, so the orphan is never adopted or collided with.
* between dst completion and pointer flip: both versions are complete and
  bit-equal in results; the no-pointer fallback picks the highest
  COMPLETE version — consistent either way.
* mid-pointer-write (the one non-atomic text overwrite): pointer missing
  or unreadable → same fallback.

Old versions are left on disk deliberately: readers that resolved before
a flip may still be scanning them; garbage-collect on the operator's
retention cadence.
"""
from __future__ import annotations

from dqx_spark.pipeline._fsutil import hadoop_path_exists

STORE_POINTER = "_current"


def _fs(spark, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p


def all_version_numbers(spark, root: str) -> list[int]:
    """Every ``vN`` dir under root, complete or not — for picking a fresh
    compaction target that cannot collide with a crashed partial write."""
    fs, p = _fs(spark, root)
    if not fs.exists(p):
        return []
    return sorted(
        int(st.getPath().getName()[1:])
        for st in fs.listStatus(p)
        if st.isDirectory()
        and st.getPath().getName().startswith("v")
        and st.getPath().getName()[1:].isdigit()
    )


def complete_versions(spark, root: str, sidecar: str) -> list[int]:
    """Version numbers whose ``sidecar`` subdir exists (the family's
    commit point) — partial compaction leftovers don't count."""
    r = root.rstrip("/")
    return [
        n for n in all_version_numbers(spark, root)
        if hadoop_path_exists(spark, f"{r}/v{n}/{sidecar}")
    ]


def write_pointer(spark, root: str, ver: str) -> None:
    spark.createDataFrame([(ver,)], "value string").coalesce(1).write.mode(
        "overwrite"
    ).text(root.rstrip("/") + "/" + STORE_POINTER)


def current_version(spark, root: str, sidecar: str) -> str:
    """Resolve the active index path: the ``_current`` pointer when it
    names a complete version, else the highest complete version (the
    documented crash fallback).  Raises when the root holds none."""
    r = root.rstrip("/")
    if hadoop_path_exists(spark, r + "/" + STORE_POINTER):
        try:
            ver = spark.read.text(r + "/" + STORE_POINTER).collect()[0]["value"].strip()
            if hadoop_path_exists(spark, f"{r}/{ver}/{sidecar}"):
                return f"{r}/{ver}"
        except Exception:  # noqa: BLE001 - fall through to the structural scan
            pass
    complete = complete_versions(spark, root, sidecar)
    if not complete:
        raise ValueError(
            f"{root!r} holds no complete index version (was the store initialized?)"
        )
    return f"{r}/v{complete[-1]}"


def next_version_path(spark, root: str) -> str:
    nums = all_version_numbers(spark, root)
    return f"{root.rstrip('/')}/v{(nums[-1] + 1) if nums else 0}"


def gc_versions(spark, root: str, sidecar: str, keep: int = 2) -> list[str]:
    """Delete superseded store versions — the retention pass the store
    docstrings defer to the operator ("old versions are left on disk
    deliberately"), now first-class.

    Retention policy, conservative by construction:

    * the CURRENT version (pointer, or highest-complete fallback) is
      always kept;
    * among complete versions numbered AT OR BELOW current, the newest
      ``keep`` survive (``keep=2`` = current + one rollback target);
    * anything numbered ABOVE current is never touched — it is either an
      in-flight compaction's partial dir or a complete-but-unflipped
      crash survivor, and both belong to the resolution rules;
    * incomplete partials numbered below current (crashed compactions
      whose numbers were skipped past) are deleted with the old versions.

    Run it on the same cadence as compaction, AFTER in-flight readers of
    old versions have drained — a reader that resolved before a pointer
    flip may still be scanning the version this deletes (the documented
    race; the pointer discipline guarantees nothing about it).  Returns
    the deleted paths."""
    if keep < 1:
        raise ValueError(f"keep must be >= 1, got {keep}")
    r = root.rstrip("/")
    cur_n = int(current_version(spark, root, sidecar).rsplit("/v", 1)[1])
    complete = [n for n in complete_versions(spark, root, sidecar) if n <= cur_n]
    keep_set = set(sorted(complete)[-keep:]) | {cur_n}
    deleted: list[str] = []
    for n in all_version_numbers(spark, root):
        if n in keep_set or n > cur_n:
            continue
        path = f"{r}/v{n}"
        fs, p = _fs(spark, path)
        fs.delete(p, True)
        deleted.append(path)
    return deleted
