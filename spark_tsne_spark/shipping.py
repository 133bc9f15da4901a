"""Ship this package to Spark's Python workers.

Closures passed to ``mapInPandas``/``applyInPandas`` are pickled by
reference to their defining module, so executors must be able to
``import spark_tsne_spark`` — true on a cluster (spark-submit
``--py-files``) and NOT automatically true locally when the driver
process hacked ``sys.path``. ``ship_package`` zips the installed
package once and registers it with ``SparkContext.addPyFile`` so the
engine works regardless of cwd / PYTHONPATH.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_spark_tsne_spark_shipped"


def ship_package(spark: SparkSession) -> None:
    """Idempotently add a zip of spark_tsne_spark to the context."""
    from spark_tsne_spark.runtime import tune_malloc

    tune_malloc()
    sc = spark.sparkContext
    if getattr(sc, _SHIPPED_ATTR, False):
        return
    import spark_tsne_spark

    pkg_dir = os.path.dirname(os.path.abspath(spark_tsne_spark.__file__))
    zip_path = os.path.join(
        tempfile.gettempdir(), f"spark_tsne_spark_pyfiles_{os.getpid()}.zip"
    )
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if not f.endswith(".py"):
                        continue
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "spark_tsne_spark", os.path.relpath(full, pkg_dir)
                    )
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    setattr(sc, _SHIPPED_ATTR, True)
