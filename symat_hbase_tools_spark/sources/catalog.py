"""Logical ``ns:table`` name resolution — the namespace layer the reference
carries in MRUtil.

The reference tools take HBase table names, including namespace-qualified
ones (``CorruptRowsMR.java:191`` documents ``--table <ns:table>``;
``CopyRow.java:107`` resolves via ``TableName.valueOf``), and
``MRUtil.java:36-40`` exists *solely* to make non-default namespaces work
in the MapReduce input path (the stock ``TableMapReduceUtil`` broke on
them). This module is the engine's twin: a logical-name catalog that maps
``ns:table`` (or bare ``table`` = the ``default`` namespace) to storage
paths, so a user can drive the CLI with the reference's exact table
arguments instead of raw parquet paths.

Resolution order:

1. A string that is an existing path, an absolute path, or a URI is used
   verbatim (backward-compatible: every pre-round-5 invocation passed
   paths).
2. ``SYMAT_TABLE_CATALOG`` (JSON file of ``{"ns:table": "/path", ...}``)
   — the explicit catalog, analogous to an HMS/HBase meta lookup.
3. Convention fallback: ``$SYMAT_WAREHOUSE/<ns>/<table>`` (warehouse
   default ``./spark-warehouse``) — the colon maps to a directory level,
   so non-default namespaces land in their own subtree, never mangled
   into a filename (the MRUtil bug class).
"""

from __future__ import annotations

import json
import os

#: env var naming a JSON catalog file mapping logical names to paths
CATALOG_ENV = "SYMAT_TABLE_CATALOG"
#: env var naming the warehouse root for convention-resolved tables
WAREHOUSE_ENV = "SYMAT_WAREHOUSE"
DEFAULT_NAMESPACE = "default"


def split_table_name(name: str) -> tuple[str, str]:
    """``"ns:table" -> ("ns", "table")``; bare names get the default
    namespace — exactly ``TableName.valueOf``'s contract."""
    ns, sep, tbl = name.partition(":")
    if not sep:
        return DEFAULT_NAMESPACE, name
    if not ns or not tbl:
        raise ValueError(f"malformed table name {name!r} (want ns:table)")
    return ns, tbl


def resolve_table(name: str) -> str:
    """Resolve a CLI table argument (path or logical ``ns:table``) to a
    storage path."""
    looks_like_path = (
        os.path.exists(name)
        or os.path.isabs(name)
        or "://" in name
        or name.startswith(("./", "../", "~"))
    )
    if looks_like_path:
        return name
    catalog_file = os.environ.get(CATALOG_ENV)
    if catalog_file:
        with open(catalog_file) as f:
            catalog = json.load(f)
        if name in catalog:
            return catalog[name]
    ns, tbl = split_table_name(name)
    root = os.environ.get(WAREHOUSE_ENV, "spark-warehouse")
    return os.path.join(root, ns, tbl)


def overwrite_table_in_place(df, path: str) -> None:
    """Overwrite a table directory that may also be an INPUT of ``df``.

    Spark cannot ``mode("overwrite")`` a path it is concurrently reading
    (the scan would see its own truncation), and the reference's CopyRow
    writes into the destination TABLE it just read from
    (``CopyRow.java:118-131``). Twin semantics: materialize to a sibling
    temp dir, then swap directories via the Hadoop FileSystem API — so
    ``hdfs://`` / ``s3a://`` tables work, not just local paths (driver-local
    ``os.rename`` would crash AFTER Spark had already written the temp dir).

    Failure posture: the destination is renamed aside and the new data
    renamed in; if the second rename fails, the original is restored in a
    ``try/except`` so the destination directory is never left absent.  A
    hard process kill between the two renames can still strand the
    ``.replaced-`` sibling (directory swap has no atomic primitive on HDFS
    or object stores); the predictable suffix makes recovery obvious.
    """

    spark = df.sparkSession
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()

    def _jp(p: str):
        return jvm.org.apache.hadoop.fs.Path(p)

    dest = _jp(path)
    fs = dest.getFileSystem(hconf)
    tmp = _jp(f"{path}.inflight-{os.getpid()}")
    old = _jp(f"{path}.replaced-{os.getpid()}")
    # clear STALE siblings from a previous hard-killed run first — for
    # ANY pid, not just ours: a crashed run under a different pid would
    # otherwise strand its .replaced- copy of the whole table forever
    # (doubling storage per crash). These suffixed dirs are only ever
    # transient artifacts of this function, so deleting them is safe.
    # Also guards PID recycling: Hadoop rename into an EXISTING directory
    # nests the source inside it instead of failing — a stale .replaced-
    # dir would swallow the table and the failure-restore below would
    # then "restore" the stale wrapper.
    for pattern in (f"{path}.inflight-*", f"{path}.replaced-*"):
        for st in fs.globStatus(_jp(pattern)) or []:
            fs.delete(st.getPath(), True)
    df.write.mode("overwrite").parquet(tmp.toString())
    dest_existed = fs.exists(dest)
    if dest_existed and not fs.rename(dest, old):
        fs.delete(tmp, True)
        raise IOError(f"could not move {path} aside for in-place overwrite")
    try:
        if not fs.rename(tmp, dest):
            raise IOError(f"could not move new data into place at {path}")
    except BaseException:
        # never leave the destination absent: put the original back,
        # and don't leak the inflight dir
        if dest_existed and not fs.exists(dest):
            fs.rename(old, dest)
        fs.delete(tmp, True)
        raise
    if dest_existed:
        fs.delete(old, True)
