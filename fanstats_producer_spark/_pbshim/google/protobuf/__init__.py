"""Alias `google.protobuf` onto the Google Cloud SDK's vendored
pure-Python protobuf runtime (`cloudsdk.google.protobuf`).

PySpark 4's `transformWithStateInPandas` speaks a protobuf protocol
between the JVM state server and the Python worker
(`pyspark/sql/streaming/proto/StateMessage_pb2.py`), so it needs an
importable `google.protobuf`.  This container has no protobuf
distribution and no network, but it DOES ship the Cloud SDK, whose
`lib/third_party/cloudsdk/google/protobuf` is the standard pure-Python
protobuf runtime (4.23.2, Apache/BSD-licensed) with its imports
rewritten to the `cloudsdk.` prefix.  This module maps every
`google.protobuf.X` import back onto `cloudsdk.google.protobuf.X` via a
meta-path finder, and synthesizes the one module the old runtime lacks:
`google.protobuf.runtime_version` (added in protobuf 5.27; Spark's
generated code only calls its version check, which a 4.x runtime that
can parse the descriptor satisfies in practice — verified end-to-end by
tests/test_streaming.py::test_transform_with_state).

This file is ONLY reachable when `fanstats_producer_spark.compat.
ensure_protobuf` has put its parent directory on sys.path, which it does
solely after a real `import google.protobuf` failed.  On any normally
provisioned cluster (protobuf pip-installed) none of this code runs.
"""

import importlib
import importlib.abc
import importlib.util
import sys
import types

_GCLOUD_THIRD_PARTY = "/usr/lib/google-cloud-sdk/lib/third_party"

if _GCLOUD_THIRD_PARTY not in sys.path:
    # Append (not prepend): the rewritten-import tree must never shadow
    # anything from the real environment.
    sys.path.append(_GCLOUD_THIRD_PARTY)

_real = importlib.import_module("cloudsdk.google.protobuf")
__version__ = _real.__version__


class _AliasLoader(importlib.abc.Loader):
    """Loader that resolves an aliased name to the already-importable
    real module object (registered under both names in sys.modules)."""

    def __init__(self, realname: str):
        self._realname = realname

    def create_module(self, spec):
        return importlib.import_module(self._realname)

    def exec_module(self, module):  # real module already executed
        pass


class _AliasFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith("google.protobuf."):
            return None
        realname = "cloudsdk." + fullname
        try:
            real_spec = importlib.util.find_spec(realname)
        except (ImportError, AttributeError):
            return None
        if real_spec is None:
            return None
        return importlib.util.spec_from_loader(
            fullname,
            _AliasLoader(realname),
            is_package=real_spec.submodule_search_locations is not None,
        )


sys.meta_path.append(_AliasFinder())

# protobuf >= 5.27 gencode imports google.protobuf.runtime_version and
# calls ValidateProtobufRuntimeVersion(domain, major, minor, patch,
# suffix, location).  The 4.x runtime predates the module; synthesize a
# permissive stand-in.  (If the version skew ever actually mattered, the
# descriptor parse right after the check would fail loudly — it does
# not, for the proto3 descriptors PySpark ships.)
_rv = types.ModuleType("google.protobuf.runtime_version")
_rv.__doc__ = "Synthesized by fanstats_producer_spark._pbshim (see pkg doc)."


class Domain:
    GOOGLE_INTERNAL = 1
    PUBLIC = 2


def ValidateProtobufRuntimeVersion(*_args, **_kwargs):
    return None


_rv.Domain = Domain
_rv.ValidateProtobufRuntimeVersion = ValidateProtobufRuntimeVersion
sys.modules["google.protobuf.runtime_version"] = _rv

# Re-export the real package's public attributes so `from google import
# protobuf; protobuf.<attr>` behaves like the real thing.
for _name in dir(_real):
    if not _name.startswith("_"):
        globals()[_name] = getattr(_real, _name)
