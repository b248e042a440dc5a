"""Namespace stub for the `google.protobuf` alias shim — see
`google/protobuf/__init__.py` in this directory and
`fanstats_producer_spark.compat.ensure_protobuf`.  This tree contains NO
protobuf code: it only aliases an already-installed pure-Python protobuf
runtime (the Google Cloud SDK's vendored copy) under its canonical
import name for environments where `pip install protobuf` is not
available.  When a real `google.protobuf` distribution is installed this
directory is never put on sys.path.
"""

__path__ = __import__("pkgutil").extend_path(__path__, __name__)
