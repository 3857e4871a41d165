"""Ship the mc2skos_spark package to executor Python workers.

On a cluster the package travels with ``spark-submit --py-files``; in
embedded/driver-harness scenarios (a SparkSession we did not launch,
arbitrary cwd) the executors' workers can still unpickle our Arrow UDFs
only if the package is importable there.  :func:`ensure_shipped` zips
the installed package once (mtime-cached) and ``addPyFile``s it —
idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

# keyed by applicationId — id(sc) can be recycled by the allocator after
# a context is stopped and collected, which would silently skip shipping
# to the NEXT context
_SHIPPED: set[str] = set()


def package_zip() -> str:
    """Build (or reuse) a zip of the mc2skos_spark package.

    Cache key is the newest source mtime at millisecond resolution
    (whole seconds would reuse a stale zip for two edits inside one
    second); the temp file carries the pid so concurrent builders never
    interleave writes into one .tmp before the atomic rename.
    """
    import mc2skos_spark

    pkg_dir = os.path.dirname(os.path.abspath(mc2skos_spark.__file__))
    newest = 0.0
    for root, _dirs, files in os.walk(pkg_dir):
        for name in files:
            if name.endswith(".py"):
                newest = max(newest, os.path.getmtime(os.path.join(root, name)))
    zip_path = os.path.join(tempfile.gettempdir(),
                            "mc2skos_spark_pkg_%d.zip" % int(newest * 1000))
    if not os.path.exists(zip_path):
        tmp = "%s.%d.tmp" % (zip_path, os.getpid())
        with zipfile.ZipFile(tmp, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for name in files:
                    if not name.endswith(".py"):
                        continue
                    full = os.path.join(root, name)
                    rel = os.path.join("mc2skos_spark",
                                       os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
        os.replace(tmp, zip_path)
    return zip_path


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(package_zip())
    _SHIPPED.add(key)
