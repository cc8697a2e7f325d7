"""AOT-serialized serving executables: zero-compile startup.

The persistent compilation cache (utils/cache.py) makes warm startups cheap
but still needs a live XLA compiler (slow over remote-compile tunnels, and a
build-time dependency in hardened serving images). This module serializes the
*compiled executables* themselves (``jax.experimental.serialize_executable``)
so a serving process can start and answer its first request without invoking
the compiler at all — the TPU-native replacement for the reference's
compile-free-but-slow eager torch serving
(/root/reference/src/api/main.py:52-86 loads weights only; every request
re-runs eager kernels).

Usage:
- **Export** (image build / deploy hook)::

    ITOR_AOT_DIR=/models/aot ITOR_AOT_EXPORT=1 \
        python -m instacart_next_order_recommendation_tpu.serve.precompile \
        --config configs/inference.yaml

  walks the serve shape lattice; every program it compiles is serialized
  into the store.
- **Serve**: set ``ITOR_AOT_DIR=/models/aot`` — the encode / fused-serve /
  top-k call sites load executables keyed by program shape and fall back to
  normal jit on a miss (e.g. an unexported shape or different device kind).

Executables are device-specific: the store namespaces by backend, device
kind, device count and JAX version, so a mismatched artifact is a clean miss,
never a wrong-machine load.
"""

from __future__ import annotations

import logging
import os
import pickle
import threading
import zlib
from pathlib import Path

logger = logging.getLogger(__name__)

_SUFFIX = ".jaxexec"
# Bump when the serve programs' calling convention changes (arguments /
# packing): stale stores become clean misses instead of in_tree errors.
_ABI_VERSION = "v2"


class AotStore:
    """Disk store of serialized compiled executables, keyed by program shape."""

    def __init__(self, root: str | os.PathLike, export: bool = False):
        self.root = Path(root) / f"{_ABI_VERSION}-{self.fingerprint()}"
        self.export = export
        self._mem: dict[str, object] = {}
        self._miss: set[str] = set()
        # Export mode compiles from thread pools (precompile --export-aot):
        # per-key locks keep concurrent same-key misses from compiling AND
        # serializing the same program twice, while distinct keys still
        # compile in parallel.
        self._mu = threading.Lock()
        self._key_locks: dict[str, threading.Lock] = {}
        if export:
            self.root.mkdir(parents=True, exist_ok=True)

    @staticmethod
    def fingerprint() -> str:
        """Executable compatibility key: backend/device/topology/JAX version.

        On the cpu backend the "device kind" is just "cpu", but XLA:CPU AOT
        results embed the compile machine's CPU model/feature set (loading on
        a different host warns and can mis-execute) — so fold in the same
        host fingerprint the persistent compilation cache uses.
        """
        import jax

        from instacart_next_order_recommendation_tpu.utils.cache import (
            _host_fingerprint,
        )

        kind = jax.devices()[0].device_kind
        if jax.default_backend() == "cpu":
            kind = f"{kind}-{_host_fingerprint()}"
        tag = f"{jax.default_backend()}_{kind}_{jax.device_count()}dev_jax{jax.__version__}"
        return "".join(c if c.isalnum() or c in "._-" else "-" for c in tag)

    @classmethod
    def from_env(cls) -> "AotStore | None":
        root = os.getenv("ITOR_AOT_DIR")
        if not root:
            return None
        export = os.getenv("ITOR_AOT_EXPORT", "").strip() in ("1", "true")
        return cls(root, export=export)

    def _path(self, key: str) -> Path:
        return self.root / f"{key}{_SUFFIX}"

    # ------------------------------------------------------------- lifecycle

    def report(self) -> dict:
        """Store size report: executables + bytes per fingerprint dir.

        The store namespaces by device/JAX-version fingerprint, so baked
        images and repo-shipped artifact dirs accrete dead executables each
        time the toolchain moves — this (with :meth:`prune_stale`) keeps the
        store inspectable and boundable.
        """
        base = self.root.parent
        dirs: dict[str, dict] = {}
        if base.exists():
            for d in sorted(p for p in base.iterdir() if p.is_dir()):
                files = list(d.glob(f"*{_SUFFIX}"))
                dirs[d.name] = {
                    "executables": len(files),
                    "bytes": sum(f.stat().st_size for f in files),
                    "current": d == self.root,
                }
        return {"current": self.root.name, "dirs": dirs}

    def prune_stale(self, dry_run: bool = False) -> list[str]:
        """Delete fingerprint dirs for OTHER device/JAX builds than this one.

        Only directories under the store root are touched; the current
        fingerprint's executables are never removed. Returns the pruned
        directory names (candidates only, when ``dry_run``).
        """
        import shutil

        base = self.root.parent
        pruned: list[str] = []
        if not base.exists():
            return pruned
        for d in sorted(p for p in base.iterdir() if p.is_dir()):
            if d == self.root:
                continue
            pruned.append(d.name)
            if not dry_run:
                shutil.rmtree(d)
                logger.info("Pruned stale AOT store dir %s", d.name)
        return pruned

    def _load(self, key: str):
        path = self._path(key)
        if not path.exists():
            return None
        import jax
        from jax.experimental import serialize_executable as se

        try:
            raw = path.read_bytes()
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                pass  # pre-compression artifact (stores written before v2.1)
            payload, in_tree, out_tree = pickle.loads(raw)
            # Serve programs are single-device; pin execution to the default
            # device (on multi-device hosts the loader would otherwise expect
            # one arg shard per local device).
            fn = se.deserialize_and_load(
                payload, in_tree, out_tree, execution_devices=jax.devices()[:1]
            )
        except Exception:  # corrupt/incompatible artifact: fall back to jit
            logger.warning("Failed to load AOT executable %s; falling back to jit", path)
            return None
        logger.info("Loaded AOT serve executable %s", path.name)
        return fn

    def _build_and_save(self, key: str, jitted, args):
        from jax.experimental import serialize_executable as se

        compiled = jitted.lower(*args).compile()
        try:
            payload, in_tree, out_tree = se.serialize(compiled)
            # Unique tmp per writer: two processes exporting into one store
            # must never replace() each other's half-written files.
            tmp = self._path(key).with_suffix(
                f".tmp-{os.getpid()}-{threading.get_ident()}"
            )
            # Compressed: serialized executables shrink ~2-3x, and store
            # size is the cold-start floor when artifacts travel over a
            # slow link (baked images, repo-shipped bench artifacts).
            tmp.write_bytes(
                zlib.compress(pickle.dumps((payload, in_tree, out_tree)), 6)
            )
            tmp.replace(self._path(key))
            logger.info("Exported AOT serve executable %s", self._path(key).name)
        except Exception:
            logger.exception("Failed to serialize executable for %s", key)
        return compiled

    def _lock_for(self, key: str) -> threading.Lock:
        with self._mu:
            return self._key_locks.setdefault(key, threading.Lock())

    def run(self, key: str, jitted, args: tuple):
        """Run ``jitted(*args)`` through the stored executable for ``key``.

        Misses fall back to the jitted callable (which hits the normal
        compilation cache); in export mode a miss compiles AND serializes.
        """
        fn = self._mem.get(key)
        if fn is None and key not in self._miss:
            with self._lock_for(key):
                fn = self._mem.get(key)  # a racing thread may have resolved it
                if fn is None and key not in self._miss:
                    fn = self._load(key)
                    if fn is None and self.export:
                        fn = self._build_and_save(key, jitted, args)
                    if fn is None:
                        self._miss.add(key)
                    else:
                        self._mem[key] = fn
        if fn is None:
            return jitted(*args)
        try:
            return fn(*args)
        except Exception:
            # A deserialized executable whose input avals don't match the
            # runtime args (stale/colliding store) must degrade to a compile,
            # not 500 every request — "a mismatched artifact is a clean
            # miss, never a wrong-machine load".
            logger.exception("Stored executable for %s rejected its args; falling back to jit", key)
            self._mem.pop(key, None)
            self._miss.add(key)
            return jitted(*args)
