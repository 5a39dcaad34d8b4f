"""Aux subsystem tests: plots, profiler, vocab builder, glove import."""

import os

import numpy as np

from dlsg_tpu.utils.plots import plot_alpha_all
from dlsg_tpu.utils.profiler import Stopwatch
from dlsg_tpu.vocab import UNK_ID, Vocabulary


def test_plot_alpha_all(tmp_path):
    alpha = np.random.default_rng(0).uniform(size=(2, 9, 12)).astype(np.float32)
    path = plot_alpha_all(alpha, num_psl=6, title="t", out_dir=str(tmp_path), epoch=1, step=2, vid=3)
    assert os.path.exists(path)
    assert path.endswith("3_1_2.png")


def test_stopwatch_spans():
    sw = Stopwatch()
    with sw.span("a"):
        pass
    with sw.span("a"):
        pass
    with sw.span("b"):
        pass
    assert sw.counts["a"] == 2
    assert "a: total" in sw.report()


def test_vocab_build_from_references(tmp_path):
    ref = tmp_path / "refs.txt"
    ref.write_text("1\tA man plays guitar.\n1\tthe man is playing\n2\ta dog runs\n")
    v = Vocabulary.build_from_references(str(ref))
    assert v("man") != UNK_ID
    assert v("guitar") != UNK_ID
    assert v("zebra") == UNK_ID
    # tokenizer lowercases and strips the period
    assert "." not in v.word2idx


def test_glove_matrix(tmp_path):
    glove = tmp_path / "glove.txt"
    glove.write_text("man 1.0 2.0\ndog 3.0 4.0\n")
    v = Vocabulary.from_words(["man", "dog", "cat"])
    from dlsg_tpu.models.glove import load_glove_matrix

    m = load_glove_matrix(v, 2, str(glove), cache_npy_path=str(tmp_path / "c.npy"))
    assert m.shape == (len(v), 2)
    np.testing.assert_allclose(m[v("man")], [1.0, 2.0])
    np.testing.assert_allclose(m[v("dog")], [3.0, 4.0])
    assert np.any(m[v("cat")] != 0)  # random init for missing
    # cache hit returns identical matrix
    m2 = load_glove_matrix(v, 2, str(glove), cache_npy_path=str(tmp_path / "c.npy"))
    np.testing.assert_allclose(m, m2)


def test_parse_opt_tuple_range_flags():
    """--msvd_test_range / --msrvtt_test_range take two ints (the reference's
    argparse for these is silently broken — type=tuple turns '1300' into
    ('1','3','0','0'), opt.py:79-89 — deliberately fixed here)."""
    from dlsg_tpu.config import parse_opt

    cfg = parse_opt(["--dataset", "msvd", "--msvd_test_range", "4", "6"])
    assert cfg.msvd_test_range == (4, 6)
    assert cfg.test_range == (4, 6)
    # defaults intact when not passed
    cfg2 = parse_opt(["--dataset", "msr-vtt"])
    assert cfg2.test_range == (7010, 10000)


def test_bench_retry_guard():
    """bench._retry_unavailable must only re-exec on relay-unavailable errors.

    The re-exec branch can't run under pytest (it would replace the test
    process); pin the guard conditions instead: non-unavailable errors and
    already-emitted results re-raise immediately.
    """
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    import pytest

    with pytest.raises(ValueError):
        bench._retry_unavailable(ValueError("some other failure"))

    # a result was already emitted -> never re-exec, surface the error
    # (_emit keeps the lock-free _best_json snapshot the guards read)
    bench._emit({"metric": "x"})
    try:
        with pytest.raises(RuntimeError):
            bench._retry_unavailable(RuntimeError("UNAVAILABLE: TPU backend"))
    finally:
        bench._best_result.clear()
        bench._best_json = ""


def test_bench_attach_watchdog_guards():
    """The attach watchdog must be a no-op once attach succeeded or a result
    exists (the re-exec branch itself can't run under pytest)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    # attach already done -> returns immediately
    bench._attach_done.set()
    try:
        bench._attach_watchdog()  # would hang/exec otherwise
    finally:
        bench._attach_done.clear()

    # result already emitted -> returns without exec (use a tiny deadline)
    old = bench.ATTACH_DEADLINE_S
    bench.ATTACH_DEADLINE_S = 0.01
    bench._emit({"metric": "x"})
    try:
        bench._attach_watchdog()
    finally:
        bench._best_result.clear()
        bench._best_json = ""
        bench.ATTACH_DEADLINE_S = old


def test_init_on_host_and_place_replicated():
    """Host-side init (utils/hostinit.py): batch-1 CPU init produces the SAME
    params as full-batch init, and place_replicated stages the tree onto the
    target device / replicated over a mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from dlsg_tpu.parallel.mesh import make_mesh
    from dlsg_tpu.utils.hostinit import init_on_host, place_replicated

    model = nn.Dense(4)
    key = jax.random.PRNGKey(0)
    v_host = init_on_host(model, key, np.zeros((8, 3), np.float32))
    v_full = model.init(key, jnp.zeros((8, 3)))
    for a, b in zip(jax.tree.leaves(v_host), jax.tree.leaves(v_full)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    placed = place_replicated(v_host)
    leaf = jax.tree.leaves(placed)[0]
    assert leaf.devices() == {jax.devices()[0]}

    mesh = make_mesh()
    placed_mesh = place_replicated(v_host, mesh)
    leaf = jax.tree.leaves(placed_mesh)[0]
    assert leaf.sharding.device_set == set(mesh.devices.flat)
    assert leaf.sharding.is_fully_replicated


def test_input_stage_dtype_is_validated():
    """Typos like 'bf16' must raise, not silently no-op the transfer knob."""
    import dataclasses

    import pytest

    from dlsg_tpu.config import DLSGConfig

    cfg = dataclasses.replace(DLSGConfig(), input_stage_dtype="bf16")
    with pytest.raises(ValueError, match="input_stage_dtype"):
        _ = cfg.stage_dtype
    assert DLSGConfig().stage_dtype is None  # fp32 default -> no cast


def test_ensure_local_cpu_backend_reports_availability():
    """Under the test env (JAX_PLATFORMS=cpu) the CPU backend exists, so the
    entry-point helper must report True and leave jax.devices() usable."""
    import jax

    from dlsg_tpu.utils.hostinit import ensure_local_cpu_backend

    assert ensure_local_cpu_backend() is True
    assert len(jax.devices("cpu")) >= 1
