"""Worker-side protobuf bootstrap for containers without the protobuf
package.

transformWithStateInPandas speaks a protobuf protocol between the
Python worker and the JVM state server
(pyspark/sql/streaming/proto/StateMessage_pb2.py). This container
ships no ``protobuf`` distribution, but a pure-python runtime is
present on disk (vendored by google-cloud-sdk, Apache-2.0). The
runtime's location is PROBED at bootstrap time from a short list of
known install roots (override with ``PBSHIM_RUNTIME_ROOT``) and
exposed through a ``pb/google/protobuf`` symlink materialized next
to this file — nothing machine-specific is committed to the repo. If
the symlink cannot be created (read-only install), the probed root
itself is appended to ``sys.path`` instead (coarser: it exposes the
vendor's whole ``google`` namespace, not just protobuf).

This module is auto-imported by the ``site`` module in EVERY Python
process whose PYTHONPATH contains this directory — which is exactly
how the forked Spark Python workers (daemon children) pick up the
shim. It does two things, both no-ops when a real protobuf install
exists:

1. appends the ``pb`` dir to ``sys.path`` so ``google.protobuf``
   resolves to the vendored pure-python runtime;
2. installs a meta-path finder that loads pyspark's generated
   ``StateMessage_pb2`` with the gencode-vs-runtime version gate
   stripped — the vendored runtime (6.32) is one minor behind the
   gencode (6.33) and the StateMessage proto uses no 6.33-only
   features, so the gate is the only thing in the way.

Driver-side, the same bootstrap runs via
``udacitycapstonedataengineer_spark.compat.ensure_protobuf_runtime``
(which also puts this directory on PYTHONPATH for the workers).
"""

from __future__ import annotations

import importlib.abc
import importlib.machinery
import importlib.util
import os
import re
import sys

_PB_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pb")

# Known roots whose <root>/google/protobuf is a pure-python runtime.
# Probed in order; PBSHIM_RUNTIME_ROOT (if set) wins.
_RUNTIME_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
    "/usr/local/google-cloud-sdk/platform/google_appengine",
    os.path.expanduser("~/google-cloud-sdk/platform/google_appengine"),
)


def _probe_runtime_root() -> str | None:
    """First root shipping a real pure-python protobuf runtime."""
    env = os.environ.get("PBSHIM_RUNTIME_ROOT")
    for root in ((env,) if env else ()) + _RUNTIME_ROOTS:
        if os.path.isfile(
            os.path.join(root, "google", "protobuf", "descriptor.py")
        ):
            return root
    return None


def _ensure_vendor_on_path() -> bool:
    """Make the vendored protobuf importable via ``_PB_DIR``.

    Prefers materializing the ``pb/google/protobuf`` symlink (scopes
    the import surface to protobuf only); races between concurrently
    bootstrapping workers are benign (FileExistsError → re-check).
    Falls back to appending the probed root itself when the package
    dir is not writable."""
    link = os.path.join(_PB_DIR, "google", "protobuf")
    if os.path.isfile(os.path.join(link, "descriptor.py")):
        return True
    root = _probe_runtime_root()
    if root is None:
        return False
    target = os.path.join(root, "google", "protobuf")
    try:
        if os.path.islink(link):  # dangling/stale link from elsewhere
            os.remove(link)
        os.makedirs(os.path.dirname(link), exist_ok=True)
        os.symlink(target, link)
    except FileExistsError:
        pass  # another worker won the race
    except OSError:
        # read-only install: coarser fallback, vendor root directly
        if root not in sys.path:
            sys.path.append(root)
        return True
    return os.path.isfile(os.path.join(link, "descriptor.py"))


def _protobuf_importable() -> bool:
    try:
        return importlib.util.find_spec("google.protobuf.descriptor") is not None
    except (ImportError, ModuleNotFoundError):
        return False


class _PatchedStateMessageLoader(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Load pyspark's StateMessage_pb2 with the runtime-version gate
    removed. Registered only when the vendored runtime is in use."""

    NAME = "pyspark.sql.streaming.proto.StateMessage_pb2"

    def find_spec(self, fullname, path=None, target=None):
        if fullname != self.NAME:
            return None
        return importlib.util.spec_from_loader(fullname, self)

    def create_module(self, spec):
        return None  # default module creation

    def exec_module(self, module):
        # locate the REAL module through the normal path machinery so
        # zip-shipped pyspark (pyspark.zip on workers) works too
        import pyspark.sql.streaming.proto as proto_pkg

        real = importlib.machinery.PathFinder.find_spec(
            self.NAME.rsplit(".", 1)[-1], list(proto_pkg.__path__)
        )
        if real is None or real.loader is None:
            raise ImportError(f"cannot locate source for {self.NAME}")
        src = real.loader.get_source(real.name)
        src_path = real.origin or "<StateMessage_pb2>"
        src = src.replace(
            "from google.protobuf import runtime_version as _runtime_version",
            "",
        )
        src = re.sub(
            r"_runtime_version\.ValidateProtobufRuntimeVersion\([^)]*\)",
            "pass",
            src,
        )
        module.__file__ = src_path
        exec(compile(src, src_path, "exec"), module.__dict__)


def _purge_poisoned_namespace(names=("google", "google.protobuf")) -> None:
    """Drop cached NAMESPACE-package entries for ``names``.

    On Spark workers, sys.path can contain spark-core_*.jar, which
    ships ``google/protobuf/*.proto`` resources — so a probe import of
    ``google.protobuf`` BEFORE our vendor dir is on sys.path caches a
    namespace package rooted in the jar, and CPython's
    ``_NamespacePath._recalculate`` never upgrades a cached namespace
    to a regular package that appears on the path later. Purging the
    (empty, side-effect-free) namespace modules lets the next import
    resolve the real package."""
    for name in reversed(names):
        mod = sys.modules.get(name)
        if mod is not None and getattr(mod, "__file__", None) is None:
            del sys.modules[name]


def bootstrap_protobuf() -> bool:
    """Idempotent; returns True iff google.protobuf is importable
    (natively or via the vendored runtime) afterwards."""
    if _protobuf_importable():
        return True  # real install present: stay out of the way
    if not _ensure_vendor_on_path():
        return False  # no vendored runtime on this machine
    if _PB_DIR not in sys.path:
        sys.path.append(_PB_DIR)  # append: never shadow real packages
    _purge_poisoned_namespace()
    if not _protobuf_importable():
        return False
    if not any(
        isinstance(f, _PatchedStateMessageLoader) for f in sys.meta_path
    ):
        sys.meta_path.insert(0, _PatchedStateMessageLoader())
    return True


_DEBUG = os.environ.get("PBSHIM_DEBUG")
if _DEBUG:
    with open(_DEBUG, "a") as _f:
        _f.write(
            f"pid={os.getpid()} argv={sys.argv!r}\n"
            f"  path={sys.path!r}\n"
            f"  PYTHONPATH={os.environ.get('PYTHONPATH')!r}\n"
        )

_r = bootstrap_protobuf()

if _DEBUG:
    with open(_DEBUG, "a") as _f:
        gp = sys.modules.get("google.protobuf")
        _f.write(f"pid={os.getpid()} bootstrap={_r} gp={getattr(gp, '__file__', None)!r}\n")
