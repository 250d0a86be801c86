"""Persistent traced-program cache (plonky2_tpu.util.export_cache)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.util.export_cache import PersistentJit, persistent_jit


def _fn(x, c, s):
    return (x * x + c) >> jnp.uint64(s)


def test_roundtrip_and_disk_reload(tmp_path, monkeypatch):
    monkeypatch.setenv("PLONKY2_TPU_CACHE", str(tmp_path))
    pj = persistent_jit(_fn, static_argnums=(2,))
    x = jnp.arange(16, dtype=jnp.uint64)
    c = jnp.uint64(5)
    ref = np.asarray(jax.jit(_fn, static_argnums=(2,))(x, c, 1))
    out1 = np.asarray(pj(x, c, 1))
    assert (out1 == ref).all()
    entries = list((tmp_path / "exports").iterdir())
    assert len(entries) == 1

    # fresh wrapper (simulates a new process): must load from disk
    pj2 = persistent_jit(_fn, static_argnums=(2,))
    out2 = np.asarray(pj2(x, c, 1))
    assert (out2 == ref).all()
    assert len(list((tmp_path / "exports").iterdir())) == 1

    # different static -> new entry
    np.asarray(pj2(x, c, 2))
    assert len(list((tmp_path / "exports").iterdir())) == 2


def test_pj_key_distinguishes_closures(tmp_path, monkeypatch):
    monkeypatch.setenv("PLONKY2_TPU_CACHE", str(tmp_path))

    def make(k):
        kk = jnp.uint64(k)
        return persistent_jit(lambda x: x + kk, name="t.closure")

    x = jnp.arange(8, dtype=jnp.uint64)
    a = np.asarray(make(3)(x, _pj_key="k3"))
    b = np.asarray(make(4)(x, _pj_key="k4"))
    assert (a == np.arange(8) + 3).all()
    assert (b == np.arange(8) + 4).all()
    assert len(list((tmp_path / "exports").iterdir())) == 2
    # key=None bypasses persistence entirely
    c = np.asarray(make(5)(x, _pj_key=None))
    assert (c == np.arange(8) + 5).all()
    assert len(list((tmp_path / "exports").iterdir())) == 2


def test_mesh_bypass(tmp_path, monkeypatch):
    monkeypatch.setenv("PLONKY2_TPU_CACHE", str(tmp_path))
    from plonky2_tpu.parallel import make_mesh, use_mesh

    pj = persistent_jit(_fn, static_argnums=(2,))
    x = jnp.arange(16, dtype=jnp.uint64)
    c = jnp.uint64(1)
    with use_mesh(make_mesh(len(jax.devices()))):
        out = np.asarray(pj(x, c, 0))
    assert (out == np.asarray(_fn(np.arange(16, dtype=np.uint64), 1, 0))).all()
    exports = (tmp_path / "exports")
    assert not exports.exists() or not list(exports.iterdir())


def test_host_only_salt_exclusions_never_import_jax():
    """The _source_salt host-only exclusion list is safe only while none of
    the excluded files can reach a traced device program: an excluded file
    importing jax (or a module that traces) could change compiled behavior
    while serving stale cached executables. Machine-check the invariant
    (ADVICE r4): no excluded .py file imports jax or jax.numpy at module
    level or inside functions."""
    import re

    import plonky2_tpu
    from plonky2_tpu.util.export_cache import _HOST_ONLY

    root = os.path.dirname(os.path.abspath(plonky2_tpu.__file__))
    pat = re.compile(r"^\s*(import jax\b|from jax\b)", re.M)
    # the cache harness itself manipulates jax exports/executables but
    # defines no traced math; it is the one legitimate jax user in the list
    allowed = {"util/export_cache.py"}
    checked = 0
    for pfx in _HOST_ONLY:
        if pfx in allowed:
            checked += 1
            continue
        full = os.path.join(root, pfx)
        files = []
        if os.path.isdir(full):
            for dp, _, fns in os.walk(full):
                files += [os.path.join(dp, f) for f in fns
                          if f.endswith(".py")]
        elif os.path.exists(full):
            files = [full]
        for f in files:
            with open(f) as fh:
                src = fh.read()
            m = pat.search(src)
            assert m is None, (
                f"{os.path.relpath(f, root)} is excluded from the export-"
                f"cache source salt but imports jax: {m.group(0)!r} — move "
                "it out of _HOST_ONLY or remove the import")
            checked += 1
    assert checked >= 5  # the exclusion list covers real files
