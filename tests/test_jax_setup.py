"""Compilation-cache scoping (round-2 verdict: XLA:CPU AOT artifacts embed
host CPU features; sharing one cache dir across machines risks SIGILL)."""

import jax

from mono_depth_estimation_tpu.utils import jax_setup


def test_cpu_cache_dir_is_machine_scoped(tmp_path):
    # conftest forces jax_platforms=cpu, so this process may compile for the
    # host CPU and must get the per-machine subdirectory
    assert jax_setup._may_compile_for_cpu()
    old = jax.config.jax_compilation_cache_dir
    try:
        jax_setup.enable_compilation_cache(str(tmp_path))
        d = jax.config.jax_compilation_cache_dir
        assert d.startswith(str(tmp_path)) and d != str(tmp_path)
        assert jax_setup._machine_tag() in d
    finally:
        jax.config.update("jax_compilation_cache_dir", old)


def test_machine_tag_is_stable_and_feature_keyed():
    t1, t2 = jax_setup._machine_tag(), jax_setup._machine_tag()
    assert t1 == t2
    arch, h = t1.rsplit("-", 1)
    assert arch and len(h) == 12
