"""Activation for the vendored protobuf mini-runtime.

``transformWithStateInPandas`` needs ``google.protobuf`` inside the
PYTHON WORKERS (PySpark's stateful_processor_api_client speaks a
protobuf wire protocol to the JVM over a socket). This sandbox ships
no protobuf and has no pip, so :func:`ensure_protobuf` makes the
vendored mini-runtime importable in both places:

- driver: prepend the shim directory to ``sys.path`` (only when the
  real package is absent — never shadows a genuine install);
- workers: zip the ``google`` tree once per session directory and
  ``SparkContext.addPyFile`` it — Spark distributes the zip and puts
  it on every Python worker's ``sys.path``, which also covers workers
  forked by an already-running daemon.

Scope guard: the mini-runtime implements the subset of the protobuf
wire format StateMessage.proto uses (varint + length-delimited
fields); see internal/mini_runtime.py for the exact contract.
"""

from __future__ import annotations

import os
import sys
import zipfile

_SHIM_DIR = os.path.dirname(os.path.abspath(__file__))


def real_protobuf_present() -> bool:
    """True when a NON-shim google.protobuf is importable."""
    try:
        import google.protobuf as gpb  # noqa: PLC0415
    except Exception:  # noqa: BLE001
        return False
    return not getattr(gpb, "__is_protoshim__", False)


def _shim_zip_path() -> str:
    return os.path.join(_SHIM_DIR, "protoshim_google.zip")


def _build_shim_zip() -> str:
    """Zip the vendored google/ tree for addPyFile; rebuilt whenever a
    source file is newer than the existing zip."""
    zip_path = _shim_zip_path()
    sources = []
    for root, _dirs, files in os.walk(os.path.join(_SHIM_DIR, "google")):
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    if os.path.exists(zip_path):
        zip_mtime = os.path.getmtime(zip_path)
        if all(os.path.getmtime(s) <= zip_mtime for s in sources):
            return zip_path
    tmp = zip_path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
        for s in sources:
            zf.write(s, os.path.relpath(s, _SHIM_DIR))
    os.replace(tmp, zip_path)
    return zip_path


def ensure_protobuf(spark=None) -> bool:
    """Make ``google.protobuf`` importable; True if it is afterwards.

    No-op when a real protobuf is installed. Otherwise activates the
    mini-runtime on the driver, and — when ``spark`` is given — ships
    it to the Python workers via ``addPyFile``. Safe to call
    repeatedly (addPyFile dedupes by filename)."""
    if not real_protobuf_present():
        if _SHIM_DIR not in sys.path:
            sys.path.insert(0, _SHIM_DIR)
        # PYTHONPATH so every python process the JVM spawns inherits
        # the shim: the TWS companion runner (StreamingPythonRunner)
        # builds its own sys.path from SPARK_HOME + the env var and
        # never sees addPyFile zips. Effective for JVMs launched AFTER
        # this call — get_spark() invokes us before the builder.
        existing = os.environ.get("PYTHONPATH", "")
        if _SHIM_DIR not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                _SHIM_DIR + (os.pathsep + existing if existing else "")
            )
        # a failed `import google` attempt may have cached a negative
        # or a namespace miss; drop it so the next import re-resolves
        for mod in ("google", "google.protobuf"):
            if mod in sys.modules and not hasattr(
                sys.modules[mod], "__is_protoshim__"
            ):
                if getattr(sys.modules[mod], "__file__", None) is None:
                    del sys.modules[mod]
    try:
        import google.protobuf  # noqa: F401,PLC0415
    except Exception:  # noqa: BLE001
        return False
    if spark is not None:
        spark.sparkContext.addPyFile(_build_shim_zip())
    return True


__all__ = ["ensure_protobuf", "real_protobuf_present"]
