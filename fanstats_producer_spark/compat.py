"""Environment-compatibility seams.

`ensure_protobuf` makes `google.protobuf` importable on BOTH the driver
and the Python workers when no protobuf distribution is installed, by
aliasing the Cloud SDK's vendored pure-Python runtime (see
`_pbshim/google/protobuf/__init__.py` for the full story).  PySpark 4's
`transformWithStateInPandas` (SURVEY.md §2B stateful row; the s10
drain) is the only consumer.

Worker-side delivery uses `SparkContext.addPyFile` with a zip of the
shim package: unlike a PYTHONPATH export, it works no matter when the
SparkSession was created (the driver's correctness harness builds its
own session before importing us), and it is the same mechanism any real
cluster uses to ship Python dependencies to executors.
"""

from __future__ import annotations

import importlib
import os
import sys
import tempfile
import zipfile

_SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_pbshim")
_shim_zip: str | None = None
_added_to: set[str] = set()


def _protobuf_importable() -> bool:
    try:
        importlib.import_module("google.protobuf")
        return True
    except ImportError:
        return False


def _build_shim_zip() -> str:
    """Zip the alias shim package once per process (a few KB)."""
    global _shim_zip
    if _shim_zip is None or not os.path.exists(_shim_zip):
        fd, path = tempfile.mkstemp(prefix="pbshim_", suffix=".zip")
        os.close(fd)
        with zipfile.ZipFile(path, "w") as zf:
            for root, _dirs, files in os.walk(_SHIM_DIR):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        zf.write(full, os.path.relpath(full, _SHIM_DIR))
        _shim_zip = path
    return _shim_zip


def ensure_protobuf(spark=None) -> bool:
    """Return True iff `google.protobuf` is importable on the driver —
    installing the alias shim first if a real distribution is absent.

    If `spark` is given and the shim is in play, also ship it to the
    Python workers via addPyFile (idempotent per session).  Callers that
    need transformWithStateInPandas should skip/raise when this returns
    False (no protobuf AND no Cloud SDK vendored runtime to alias)."""
    if "google.protobuf" in sys.modules or _protobuf_importable():
        shimmed = _SHIM_DIR in sys.path
    else:
        if _SHIM_DIR not in sys.path:
            sys.path.insert(0, _SHIM_DIR)
        if not _protobuf_importable():
            # Leave os.environ untouched on failure — nothing to alias.
            return False
        shimmed = True
        # NOTE: worker delivery is scoped to sc.environment/addPyFile
        # below; we deliberately do NOT export into os.environ, so a
        # child process that has a real protobuf in site-packages never
        # resolves the shim first (PYTHONPATH precedes site-packages).
    if shimmed and spark is not None:
        sc = spark.sparkContext
        # Worker-side delivery, two channels:
        # (1) task workers: addPyFile ships the shim zip and worker.py
        #     puts it on sys.path via the pythonIncludes mechanism;
        # (2) the transformWithStateInPandas DRIVER worker
        #     (StreamingPythonRunner) ignores pythonIncludes but spawns
        #     with the PythonFunction's envVars = sc.environment — so
        #     export the shim dir there.  Both are set BEFORE the UDF is
        #     wrapped (callers invoke ensure_protobuf first), which is
        #     when sc.environment is captured.
        pp = sc.environment.get("PYTHONPATH", "")
        if _SHIM_DIR not in pp.split(os.pathsep):
            sc.environment["PYTHONPATH"] = (
                _SHIM_DIR + (os.pathsep + pp if pp else "")
            )
        app_id = sc.applicationId
        if app_id not in _added_to:
            sc.addPyFile(_build_shim_zip())
            _added_to.add(app_id)
    return True
