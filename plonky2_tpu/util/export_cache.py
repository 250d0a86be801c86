"""Persistent traced-program cache: jax.export artifacts on disk.

The persistent XLA compilation cache removes repeat *compiles*, but every
new process still pays Python tracing + MLIR lowering for each program —
for prover-sized programs (the fused quotient evaluation alone traces tens
of thousands of primitives) that is minutes of host time per circuit. This
module wraps `jax.jit` entry points so the traced+lowered artifact
(`jax.export` StableHLO) is serialized to disk keyed by (function identity,
package source hash, jax version, backend, static args, input avals):
warm processes deserialize (~ms) and call, skipping tracing and lowering
entirely; the XLA binary cache then removes the compile.

The reference has no analog (Rust monomorphizes at build time — *its*
"tracing" is cargo build); this is the TPU-native equivalent of shipping a
compiled prover binary.

Safety: the key includes a hash of every plonky2_tpu/*.py source file, so
any code change invalidates the cache wholesale. Entries are
platform-specific (exports bake the lowering platform). Sharded/mesh
executions bypass the cache (plonky2_tpu.parallel owns those). Any failure
falls back to the plain jit path. Opt out with PLONKY2_TPU_EXPORT_CACHE=0.
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading

import numpy as np

_ENABLED = os.environ.get("PLONKY2_TPU_EXPORT_CACHE", "1") != "0"
_LOCK = threading.Lock()


def cache_dir() -> str:
    base = os.environ.get(
        "PLONKY2_TPU_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "plonky2_tpu_xla"))
    if base == "0":
        return ""
    return os.path.join(base, "exports")


# Host-only subtrees that can never change a traced device program: the C++
# runtime, the witness engine, host utilities (this cache, rng, TimingTree),
# and CLI surfaces. Editing these must NOT invalidate compiled TPU binaries —
# cold compiles cost minutes per program over the remote relay. Everything
# else (field/ops/hash/fri/plonk/gates/gadgets/starky/recursion/parallel and
# iop/challenger.py's DeviceChallenger) is traced into device programs and
# stays in the salt. A stale-salt mistake fails LOUD, not silent: a stale
# executable computes an old transcript and verification rejects the proof.
_HOST_ONLY = (
    "native/", "examples/", "util/export_cache.py", "util/rng.py",
    "iop/generator.py", "iop/witness.py", "iop/witness_plan.py",
    "iop/target.py",
)


@functools.lru_cache(maxsize=1)
def _source_salt() -> str:
    """Hash of the device-relevant package sources: any change to code that
    can reach a traced program invalidates the cache wholesale."""
    import plonky2_tpu

    root = os.path.dirname(os.path.abspath(plonky2_tpu.__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirpath, fn)
            rel = os.path.relpath(p, root).replace(os.sep, "/")
            if any(rel.startswith(pfx) for pfx in _HOST_ONLY):
                continue
            h.update(rel.encode())
            with open(p, "rb") as f:
                h.update(f.read())
    return h.hexdigest()[:16]


def _aval_sig(x) -> str:
    import jax

    if isinstance(x, jax.core.Tracer):
        a = x.aval
        return f"{a.dtype}{list(a.shape)}"
    if isinstance(x, jax.Array):
        return f"{x.dtype}{list(x.shape)}"
    a = np.asarray(x)
    return f"{a.dtype}{list(a.shape)}"


def _single_device(x) -> bool:
    import jax

    if isinstance(x, jax.core.Tracer):
        return True  # aval only; sharding decided by the outer program
    if isinstance(x, jax.Array):
        try:
            return len(x.sharding.device_set) == 1
        except Exception:
            return False
    return True  # numpy / python scalars


class PersistentJit:
    """jax.jit with disk-persistent compiled artifacts per signature.

    Two tiers, tried in order:
      1. serialized PjRt EXECUTABLE (<key>.jaxexec): a fresh process
         deserialize_and_loads the compiled binary in ~0.5 s — no tracing,
         no MLIR lowering, no (re)compile. This is what makes cold driver
         processes fast: the Mosaic-heavy prover programs cost 60-500 s of
         tracing+lowering each without it, and their jax.export round trip
         crashes the relay's chipless AOT compiler (VectorLayout u64
         check), so tier 2 can never serve them.
      2. jax.export StableHLO artifact (<key>.jaxexp): skips tracing and
         lowering; the XLA persistent cache then skips the compile. Still
         used on backends where executable serialization is unavailable.
    Any failure falls back to plain jit."""

    def __init__(self, fn, static_argnums=(), name: str | None = None):
        self._fn = fn
        self._static = tuple(sorted(
            static_argnums if isinstance(static_argnums, (tuple, list))
            else (static_argnums,)))
        self._name = name or f"{fn.__module__}.{fn.__qualname__}"
        self._jit = None  # plain jit fallback, built lazily
        self._bound_jits: dict = {}
        self._exports: dict = {}
        self._call_jits: dict = {}
        self._execs: dict = {}
        self._bad_keys: set = set()
        functools.update_wrapper(self, fn)

    # -- plain jit path ------------------------------------------------------
    def _plain(self):
        import jax

        if self._jit is None:
            self._jit = jax.jit(self._fn, static_argnums=self._static)
        return self._jit

    def _bound_jit(self, statics):
        """jit over only the dynamic args, static values closed over."""
        import jax

        jfn = self._bound_jits.get(statics)
        if jfn is None:
            static_ix = self._static

            def bound(*dyn):
                full = []
                it = iter(dyn)
                si = iter(statics)
                n = len(dyn) + len(static_ix)
                for i in range(n):
                    full.append(next(si) if i in static_ix else next(it))
                return self._fn(*full)

            jfn = jax.jit(bound)
            self._bound_jits[statics] = jfn
        return jfn

    # -- cache key -----------------------------------------------------------
    def _key(self, statics, dyn, extra: str) -> str:
        import jax

        parts = [
            self._name, _source_salt(), jax.__version__,
            jax.default_backend(), repr(statics), extra,
        ] + [_aval_sig(a) for a in dyn]
        return hashlib.sha256("|".join(parts).encode()).hexdigest()[:32]

    def _get_export(self, key, jfn, dyn):
        from jax import export

        exp = self._exports.get(key)
        if exp is not None:
            return exp
        d = cache_dir()
        path = os.path.join(d, key + ".jaxexp") if d else ""
        if path and os.path.exists(path):
            with open(path, "rb") as f:
                exp = export.deserialize(f.read())
        else:
            checks = [
                export.DisabledSafetyCheck.custom_call(t)
                for t in ("tpu_custom_call", "Sharding",
                          "annotate_device_placement")
            ]
            exp = export.export(jfn, disabled_checks=checks)(*dyn)
            if path:
                os.makedirs(d, exist_ok=True)
                blob = exp.serialize()
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
        with _LOCK:
            self._exports[key] = exp
        return exp

    # -- tier 1: serialized compiled executables -----------------------------
    def _exec_path(self, key: str) -> str:
        d = cache_dir()
        return os.path.join(d, key + ".jaxexec") if d else ""

    def _get_exec(self, key, statics, dyn):
        """Load (or AOT-compile + persist) the compiled executable for this
        signature. Returns a callable over the dynamic args, or None when
        the backend does not support executable serialization."""
        import jax

        fn = self._execs.get(key)
        if fn is not None:
            return fn
        if jax.default_backend() == "cpu":
            # CPU AOT binaries SIGILL on feature-mismatched hosts (round-2
            # finding) and CPU compiles are local anyway — tier 2 suffices.
            return None
        import pickle

        from jax.experimental import serialize_executable as se

        path = self._exec_path(key)
        if path and os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    blob, in_tree, out_tree = pickle.load(f)
                fn = se.deserialize_and_load(blob, in_tree, out_tree)
                with _LOCK:
                    self._execs[key] = fn
                return fn
            except Exception:
                try:
                    os.remove(path)  # stale (jaxlib/libtpu change) — rebuild
                except OSError:
                    pass
        jfn = (self._bound_jit(statics) if self._static else self._plain())
        compiled = jfn.lower(*dyn).compile()
        try:
            blob, in_tree, out_tree = se.serialize(compiled)
            if path:
                os.makedirs(os.path.dirname(path), exist_ok=True)
                tmp = path + f".tmp{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump((blob, in_tree, out_tree), f)
                os.replace(tmp, path)
        except Exception:
            pass  # unserializable program: still use the compiled object
        with _LOCK:
            self._execs[key] = compiled
        return compiled

    def _bad_path(self, key: str) -> str:
        d = cache_dir()
        return os.path.join(d, key + ".bad") if d else ""

    def _key_is_bad(self, key: str) -> bool:
        if key in self._bad_keys:
            return True
        p = self._bad_path(key)
        if p and os.path.exists(p):
            self._bad_keys.add(key)
            return True
        return False

    def _poison(self, key: str) -> None:
        """Mark a key whose exported program fails to (re)compile. Without
        this, every call would re-attempt the failing compile before falling
        back to plain jit (observed: the axon AOT relay SIGABRTs re-compiling
        exported Mosaic u64 kernels, ~10s per attempt — it made every warm
        Merkle commit pay 10s). Persisted on disk so future processes skip
        the attempt entirely."""
        self._bad_keys.add(key)
        p = self._bad_path(key)
        if p:
            try:
                os.makedirs(os.path.dirname(p), exist_ok=True)
                with open(p, "w") as f:
                    f.write("export recompile failed; plain-jit fallback\n")
            except OSError:
                pass

    def __call__(self, *args, _pj_key: str | None = ""):
        if not _ENABLED or _pj_key is None:
            return self._plain()(*args)
        key = None
        try:
            from plonky2_tpu.parallel import active_mesh

            if active_mesh() is not None:
                return self._plain()(*args)
            import jax

            statics = tuple(args[i] for i in self._static)
            dyn = [a for i, a in enumerate(args) if i not in self._static]
            leaves = jax.tree_util.tree_leaves(dyn)
            if not all(_single_device(a) for a in leaves):
                return self._plain()(*args)
            key = self._key(statics, leaves, _pj_key)
            try:
                fn = self._get_exec(key, statics, dyn)
            except Exception:
                fn = None
            if fn is not None:
                return fn(*dyn)
            jfn = (self._bound_jit(statics) if self._static else self._plain())
            if self._key_is_bad(key):
                return self._plain()(*args)
            exp = self._get_export(key, jfn, dyn)
            # exp.call outside jit re-lowers (and for programs containing
            # tpu_custom_call, re-COMPILES the Mosaic kernel) on every
            # invocation — ~10s per warm call over the axon relay. A cached
            # jit wrapper compiles once per process and then dispatches the
            # cached executable.
            cfn = self._call_jits.get(key)
            if cfn is None:
                cfn = jax.jit(exp.call)
                with _LOCK:
                    self._call_jits[key] = cfn
            return cfn(*dyn)
        except Exception:
            if key is not None:
                self._poison(key)
            return self._plain()(*args)


def persistent_jit(fn=None, *, static_argnums=(), name=None):
    """Drop-in replacement for @jax.jit/@partial(jax.jit, static_argnums=...)
    with a disk-persistent export cache. Falls back to plain jit whenever the
    cache can't apply (mesh active, sharded inputs, export failure)."""
    if fn is None:
        return lambda f: PersistentJit(f, static_argnums, name)
    return PersistentJit(fn, static_argnums, name)
