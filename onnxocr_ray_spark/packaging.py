"""Package shipping: the spark-submit --py-files idiom, self-service.

On a real cluster the package rides along as
``spark-submit --py-files onnxocr_ray_spark.zip job.py`` (SURVEY.md §7.0;
the reference ships models the same way via Ray Serve's runtime env /
SparkFiles). For sessions the caller built themselves (the driver
harness, a notebook), ``ship_package(spark)`` zips the installed package
and registers it with ``sc.addPyFile`` so executor Python workers can
unpickle closures that reference ``onnxocr_ray_spark.*`` — regardless of
the driver's cwd.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_FLAG = "_onnxocr_ray_spark_shipped"


def _pkg_files(pkg_dir: str):
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in sorted(files):
            if fn.endswith(".py"):
                yield os.path.join(root, fn)


def package_zip_path() -> str:
    """Create a zip of the onnxocr_ray_spark package, named by content
    digest so edits to the package invalidate previously shipped zips."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    digest = hashlib.md5()
    for full in _pkg_files(pkg_dir):
        digest.update(full.encode())
        with open(full, "rb") as fh:
            digest.update(fh.read())
    out = os.path.join(
        tempfile.gettempdir(), f"onnxocr_ray_spark_pyfiles_{digest.hexdigest()[:12]}.zip"
    )
    if not os.path.exists(out):
        tmp = out + f".tmp{os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for full in _pkg_files(pkg_dir):
                rel = os.path.join("onnxocr_ray_spark", os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
        os.replace(tmp, out)
    return out


def ship_package(spark: SparkSession) -> None:
    """Idempotently make the package importable on executors."""
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_FLAG, False):
        return
    sc.addPyFile(package_zip_path())
    setattr(sc, _SHIPPED_FLAG, True)
