"""Benchmark: beam-5 decode throughput + GAN train throughput (north star).

Prints JSON result lines to stdout as measurements land (the driver keeps the
LAST parseable line):
  1. immediately after the decode measurement — a decode-only line (train
     fields zeroed), so a timeout during the train compile still records the
     primary serving metric;
  2. after the train measurement — the final combined line.

Budget safety (the round-3 driver artifact was rc=124/parsed=null because the
run died inside the train-step compile):
  - `DLSG_BENCH_BUDGET_S` (default 1500) is the total wall budget. A watchdog
    thread force-exits with rc=0 shortly before the budget expires, even if
    the main thread is blocked inside a native remote-compile call, after
    re-printing the best result so far.
  - the train bench is only attempted if enough budget remains for its
    compile (worst observed relay compile ~400 s).
  - a persistent compilation cache is enabled best-effort so re-runs in the
    same image skip the long compiles entirely.

Methodology (robust to the remote-TPU relay where `block_until_ready` does not
block and long compiles kill the relay connection):
- each measured function returns a tiny scalar that CHAINS between calls
  (call N+1 consumes call N's output), so repeated timed host fetches measure
  true per-step device time even under async dispatch;
- the constant fetch round-trip overhead (~30ms on the relay, <1ms locally) is
  measured with a null jit function and subtracted;
- only two large compilations are issued (plain decode, plain train step) —
  loop-wrapped variants exceed the relay's compile window.

The reference never measured throughput (SURVEY.md §6; BASELINE.json
published = {}); `vs_baseline` compares against BENCH_prev.json when present.
"""

from __future__ import annotations

import json
import os
import signal
import statistics
import sys
import threading
import time

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("DLSG_BENCH_BUDGET_S", "1500"))
# Leave this much slack for the watchdog to print + flush before the driver's
# own timeout would SIGKILL us.
WATCHDOG_SLACK_S = 45.0
# Don't start the train bench unless at least this much budget remains
# (worst observed relay train-step compile ~400 s + measurement + margin).
TRAIN_MIN_REMAINING_S = float(os.environ.get("DLSG_BENCH_TRAIN_MIN_S", "560"))

_best_result: dict = {}
_result_lock = threading.Lock()


def _elapsed() -> float:
    return time.monotonic() - _T0


def _remaining() -> float:
    return BUDGET_S - _elapsed()


def _emit(result: dict) -> None:
    """Record + print a result line (driver keeps the last parseable line)."""
    with _result_lock:
        _best_result.clear()
        _best_result.update(result)
        print(json.dumps(result), flush=True)


def _watchdog() -> None:
    """Force rc=0 before the driver's timeout even if stuck in native code."""
    deadline = BUDGET_S - WATCHDOG_SLACK_S
    while _elapsed() < deadline:
        time.sleep(min(5.0, deadline - _elapsed()) + 0.01)
    with _result_lock:
        if _best_result:
            print(json.dumps(_best_result), flush=True)
            sys.stdout.flush()
            print("bench: watchdog budget exit", file=sys.stderr, flush=True)
            os._exit(0)
        else:  # nothing measured yet — let the driver see the failure
            print("bench: watchdog expired with no result", file=sys.stderr, flush=True)
            os._exit(3)


# Device attach can also HANG (no exception) when the relay tunnel is dead —
# observed as jax.devices() blocking >15 min. One stalled attach would burn
# the whole budget, so a second watchdog re-execs a fresh interpreter (fresh
# attach attempt) if the first device query hasn't succeeded by the deadline
# and enough budget remains for another try.
ATTACH_DEADLINE_S = float(os.environ.get("DLSG_BENCH_ATTACH_DEADLINE_S", "300"))
_attach_done = threading.Event()


def _attach_watchdog() -> None:
    if _attach_done.wait(ATTACH_DEADLINE_S):
        return
    with _result_lock:
        if _best_result:
            return  # something already measured; let the budget watchdog rule
    if _remaining() > ATTACH_DEADLINE_S + 120.0:
        print(
            f"bench: device attach stalled >{ATTACH_DEADLINE_S:.0f}s, re-exec "
            f"({_remaining():.0f}s budget left)",
            file=sys.stderr, flush=True,
        )
        os.environ["DLSG_BENCH_BUDGET_S"] = str(max(_remaining(), 60.0))
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
    # not enough budget for another attach — leave it to the budget watchdog


# the watchdog must be live BEFORE `import jax`: the sitecustomize-registered
# TPU plugin can block inside the import waiting on a relay session grant,
# which would otherwise reproduce the rc=124/no-output driver failure
def _sigterm_handler(signum, frame):  # noqa: ARG001
    """An external `timeout` sends SIGTERM at ITS deadline, which may be
    shorter than our budget — re-print the best result so the last stdout
    line is a parseable JSON result even when the wrapper reports rc=124."""
    with _result_lock:
        if _best_result:
            print(json.dumps(_best_result), flush=True)
        print("bench: SIGTERM exit", file=sys.stderr, flush=True)
    os._exit(0 if _best_result else 3)


if __name__ == "__main__":  # never arm the watchdog on a mere import
    signal.signal(signal.SIGTERM, _sigterm_handler)
    threading.Thread(target=_watchdog, daemon=True).start()
    threading.Thread(target=_attach_watchdog, daemon=True).start()

import jax  # noqa: E402  (after watchdog scaffolding: import can be slow)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

try:  # best-effort: skips the 40-400s relay compiles on re-runs
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception as e:  # pragma: no cover - older jax
    print(f"bench: no persistent cache ({e})", file=sys.stderr)


def _fetch(x) -> float:
    return float(np.asarray(x))


def _median_call_time(fn, state, repeats):
    """Median wall time of chained fn calls; returns (seconds, final_state)."""
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        state = fn(state)
        _fetch(state if not isinstance(state, tuple) else state[-1])
        times.append(time.perf_counter() - t0)
    return statistics.median(times), state


def _null_overhead(repeats=10):
    null = jax.jit(lambda x: x + 1.0)
    s = jnp.float32(0)
    _fetch(null(s))
    t, _ = _median_call_time(lambda x: null(x), s, repeats)
    return t


def _example(cfg, vocab_size, batch, seed=0):
    rng = np.random.default_rng(seed)
    frames = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.feature_size)), jnp.float32
    )
    regions = jnp.asarray(
        rng.normal(size=(batch, cfg.max_frames, cfg.num_obj, cfg.region_feature_size)),
        jnp.float32,
    )
    captions = jnp.asarray(
        rng.integers(4, vocab_size, size=(batch, cfg.max_words)), jnp.int32
    )
    lengths = jnp.asarray(rng.integers(5, cfg.max_words, size=(batch,)), jnp.int32)
    return frames, regions, captions, lengths


def bench_decode(cfg, vocab_size, batch, repeats=8):
    from dlsg_tpu.evaluation.evaluate import make_decode_fn
    from dlsg_tpu.models.generator import CapGnnModel

    model = CapGnnModel(cfg, vocab_size)
    frames, regions, captions, _ = _example(cfg, vocab_size, batch)
    variables = model.init(jax.random.PRNGKey(0), frames, regions, captions)
    decode = make_decode_fn(model, cfg, beam_size=5)

    @jax.jit
    def step(c, variables, frames, regions):
        # the input perturbation chains successive calls (true serialization).
        # everything big is an ARGUMENT — closure constants would be embedded
        # in the HLO and shipped through the remote-compile relay.
        ids = decode(variables, frames + c * 1e-12, regions)
        return (jnp.sum(ids) % 97).astype(jnp.float32)

    print("bench: compiling decode...", file=sys.stderr, flush=True)
    _fetch(step(jnp.float32(0), variables, frames, regions))
    print(f"bench: decode compiled ({_elapsed():.0f}s)", file=sys.stderr, flush=True)
    overhead = _null_overhead()
    t, _ = _median_call_time(
        lambda c: step(c, variables, frames, regions), jnp.float32(0), repeats
    )
    per_call = max(t - overhead, 1e-6)
    return batch / per_call, per_call


def bench_train(cfg, vocab_size, batch, repeats=6):
    from dlsg_tpu.models.discriminator import DiscV2
    from dlsg_tpu.models.generator import CapGnnModel
    from dlsg_tpu.train.gan_lambda import init_lambda_state
    from dlsg_tpu.train.optim import TrainState, make_optimizer
    from dlsg_tpu.train.steps import make_gan_train_step, make_masks

    gen = CapGnnModel(cfg, vocab_size)
    disc = DiscV2(cfg, vocab_size)
    frames, regions, captions, lengths = _example(cfg, vocab_size, batch)
    batch_d = {
        "frames": frames, "regions": regions, "captions": captions, "lengths": lengths
    }
    g_vars = gen.init(jax.random.PRNGKey(0), frames, regions, captions)
    onehot = jax.nn.one_hot(captions, vocab_size)
    _, att = make_masks(captions)
    alpha = jnp.ones((batch, cfg.max_words, 2 * cfg.num_proposals))
    obj = jnp.zeros((batch, cfg.num_proposals, cfg.visual_hidden_size))
    d_vars = disc.init(jax.random.PRNGKey(1), onehot, obj, obj, att, alpha)

    step = make_gan_train_step(gen, disc, cfg)
    gstate = TrainState.create(g_vars["params"], make_optimizer(1.6e-4))
    dstate = TrainState.create(d_vars["params"], make_optimizer(1.6e-4))
    lstate0 = init_lambda_state(0.01)
    key = jax.random.key(7, impl=cfg.rng_impl)  # rbg: hw RNG for dropout

    def chained(state):
        gs, ds, ls = state
        # the step takes the batch as an argument (no giant HLO constants)
        gs, ds, ls, m = step(gs, ds, ls, batch_d, key, jnp.float32(0.9))
        return (gs, ds, ls, m["cap_loss"])

    print("bench: compiling train step...", file=sys.stderr, flush=True)
    gs, ds, ls, loss = chained((gstate, dstate, lstate0))
    _fetch(loss)
    print(f"bench: train step compiled ({_elapsed():.0f}s)", file=sys.stderr, flush=True)
    overhead = _null_overhead()
    t, _ = _median_call_time(lambda s: chained(s[:3]), (gs, ds, ls, loss), repeats)
    per_call = max(t - overhead, 1e-6)
    return batch / per_call, per_call


def _result_line(decode_cps, decode_dt, train_cps, train_dt, batch, vocab_size,
                 compute_dtype, vs):
    return {
        "metric": "captions_per_sec_beam5_msrvtt",
        "value": round(decode_cps, 2),
        "unit": "captions/s",
        "vs_baseline": round(vs, 3),
        "extra": {
            "decode_batch_ms": round(decode_dt * 1e3, 2),
            "train_clips_per_sec_gan": round(train_cps, 2),
            "train_step_ms": round(train_dt * 1e3, 2),
            "batch": batch,
            "vocab": vocab_size,
            "compute_dtype": compute_dtype,
            "device": str(jax.devices()[0]),
        },
    }


def main():
    from dlsg_tpu.config import DLSGConfig, apply_dataset_overrides

    # bfloat16 is convergence-validated (tests/test_learning.py passes the same
    # memorization thresholds in bf16 as fp32), so it is the benchmark default.
    compute_dtype = os.environ.get("DLSG_BENCH_DTYPE", "bfloat16")
    cfg = apply_dataset_overrides(
        DLSGConfig(dataset="msr-vtt", compute_dtype=compute_dtype)
    )
    on_tpu = jax.devices()[0].platform != "cpu"
    _attach_done.set()  # device attach succeeded — disarm the attach watchdog
    batch = 128 if on_tpu else 8
    vocab_size = 10000 if on_tpu else 512

    vs = 1.0
    prev_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_prev.json")
    if os.path.exists(prev_path):
        try:
            prev = json.load(open(prev_path))
            if prev.get("value"):
                vs_base = float(prev["value"])
            else:
                vs_base = 0.0
        except Exception:
            vs_base = 0.0
    else:
        vs_base = 0.0

    decode_cps, decode_dt = bench_decode(cfg, vocab_size, batch)
    if vs_base:
        vs = decode_cps / vs_base
    print(f"bench: decode {decode_cps:.1f} captions/s", file=sys.stderr, flush=True)
    # Emit the decode-only line NOW — a timeout in the train compile must not
    # lose the primary metric (round-3 failure mode).
    _emit(_result_line(decode_cps, decode_dt, 0.0, 0.0, batch, vocab_size,
                       compute_dtype, vs))

    skip_train = os.environ.get("DLSG_BENCH_SKIP_TRAIN") == "1"
    if not skip_train and _remaining() < TRAIN_MIN_REMAINING_S:
        print(
            f"bench: skipping train bench ({_remaining():.0f}s budget left "
            f"< {TRAIN_MIN_REMAINING_S:.0f}s needed)",
            file=sys.stderr, flush=True,
        )
        skip_train = True
    if not skip_train:
        try:
            train_cps, train_dt = bench_train(cfg, vocab_size, batch)
            print(
                f"bench: train {train_cps:.1f} clips/s ({train_dt*1e3:.1f} ms)",
                file=sys.stderr, flush=True,
            )
            _emit(_result_line(decode_cps, decode_dt, train_cps, train_dt,
                               batch, vocab_size, compute_dtype, vs))
        except Exception as e:  # keep the primary metric even if the relay dies
            print(f"train bench failed: {type(e).__name__}: {e}", file=sys.stderr)


def _retry_unavailable(exc: BaseException) -> None:
    """Re-exec on a relay-unavailable backend error (fresh process required).

    A dead TPU session grant takes ~5 min to release (CLAUDE.md); jax caches
    the failed backend for the life of the process, so the only way to retry
    the attach is a fresh interpreter. Carry the *remaining* wall budget in
    DLSG_BENCH_BUDGET_S so the watchdog deadline stays aligned with the
    driver's timeout across the exec.
    """
    msg = f"{type(exc).__name__}: {exc}"
    if "UNAVAILABLE" not in msg and "Unavailable" not in msg:
        raise exc
    wait_s = 150.0
    if _best_result or _remaining() < wait_s + TRAIN_MIN_REMAINING_S / 2:
        print(f"bench: backend unavailable, not retrying ({msg[:200]})",
              file=sys.stderr, flush=True)
        raise exc
    print(f"bench: backend unavailable, re-exec in {wait_s:.0f}s ({msg[:200]})",
          file=sys.stderr, flush=True)
    # disarm the attach watchdog: the attach FAILED (not hung), and this
    # deliberate cooldown lets the ~5-min session grant release — an exec
    # mid-sleep would retry into a still-held grant and waste the cycle
    _attach_done.set()
    time.sleep(wait_s)
    os.environ["DLSG_BENCH_BUDGET_S"] = str(max(_remaining(), 60.0))
    sys.stdout.flush()
    sys.stderr.flush()
    os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 - single retry point for relay flake
        _retry_unavailable(e)
