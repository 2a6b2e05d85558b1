"""Benchmark: Up-Down VQA batch-inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "questions/s", "vs_baseline": R}

The headline BASELINE.json target is >= 5x the reference PyTorch GPU
questions/sec for batch inference. The reference publishes no speed numbers
(SURVEY.md section 6), so the baseline is anchored to a measurement taken on
this host (2026-08-16, torch 2.x CPU): the reference model (GRU question
encoder + 36-box fusion attention + 2-layer classifier, ~0.25
GFLOP/question) run through its eager eval loop shape (batch 128 forward,
`/root/reference/train.py:162-222`) sustains **165 questions/s on one CPU
core** (773 ms/batch-128, single-threaded — this container exposes 1 core).
The 2019-class single GPU implied by the repo runs the same eager loop
~15-40x faster than one CPU core for this GEMM mix; the upstream
bottom-up-attention-vqa codebase this reference derives from reports epoch
times equivalent to ~2.2k q/s *training* on a Titan Xp, putting eager eval
at roughly 2x that. REF_GPU_QPS = 165 x 30 = ~5,000 q/s encodes the
measured floor x documented factor (2x the round-1 guess of 2,500 —
deliberately the stricter bar). NOTE: the divisor is an honest estimate,
not a measurement of the reference on a GPU. vs_baseline =
value / (5 * REF_GPU_QPS), so vs_baseline >= 1.0 means the 5x target is met.

Budget-aware ladder (round 4 structure — BENCH_r03 timed out with nothing
emitted, so it is guaranteed-result-first; round-5 order — the top rung
moved up once its staging was fixed. Fully warm, the whole ladder emits
the fast32 number in ~20 s; measured 940.1k q/s at 19.4 s total wall,
2026-08-20):

  1. ``medium`` — bf16 params + Pallas GRU, dense bf16 feed (536k q/s
                  r4). Runs FIRST in a watchdogged subprocess: across the
                  r4 ladder runs it is the empirically most reliable
                  graph (landed 4/4; the f32 graph stalled 2/4) and is
                  worth 1.55x the f32 rate. Warm compilation cache =>
                  two SHORT 150 s tries instead of one long one: window
                  quality is roulette (the same cached graph compiled in
                  5.8 s and stalled past 240 s minutes apart), and a
                  warm attempt is one cached staging compile + one
                  dispatch — but not shorter than 150 s, because "warm"
                  is detected from infer_chain cache entries and the
                  STAGE graph can still be cold (~98 s compile + ~25 s
                  import). Its number is held.
  2. ``fast32`` — the int8-feed fast config at B=32768: since round 5
                  the TOP rung by value (941.1k q/s, 37.6x, vs fast's
                  890k in the same window). Its r4 driver failure mode —
                  the staging producer held TWO f32 [32768, 36, 2048]
                  (~9.7 GB) feature temps live at once and OOMed v5e
                  HBM (BENCH_r04 tail) — is fixed: above
                  _DENSE_TEMP_LIMIT the producer generates the int8
                  feed DIRECTLY in its final dtype (uint8 bits +
                  uniform scales; no f32 temps at all, peak staging
                  ~5 GB at B=32768), and the tiny elementwise graph
                  also compiles fast through the relay (51 s cold /
                  ~2 s warm; a chunked lax.map variant measured an
                  895 s stage compile — rejected). Runs only once
                  medium's number is held, with a reserve left for a
                  fast attempt; gets a second chance after fast if its
                  slot stalled.
  3. ``fast``   — the same economics at B=16384 (int8 feature feed +
                  bf16 params + lazy-v pooling + the streaming Pallas
                  GRU kernel; 890-892k q/s). Worth -4..6% vs fast32 in
                  the same window, so it runs only when fast32 is not
                  already held. Its compile through the relay is the
                  variable one (62.7 s and 313.1 s observed for the
                  SAME graph cold; 2.2 s warm), bounded against the
                  hard self-imposed deadline (VQA_BENCH_DEADLINE_S,
                  default 460 s — the driver window is assumed to be as
                  small as ~10 min total), minus a safety-net reserve
                  if nothing has landed yet.
  4. ``safe``   — f32 XLA (345k q/s r4). The safety net: a different
                  graph and failure surface, rolled (then medium again,
                  bounded) only if nothing has landed.

The parent process never imports JAX; each config runs in its own
subprocess so a remote-compile hang can only burn its own slice of the
budget. Exactly one JSON line is emitted at the end — the best result
obtained — and phase-progress lines go to stderr so a future timeout is
diagnosable from the captured tail. The XLA compilation cache is persisted
(JAX_COMPILATION_CACHE_DIR, default .jax_cache next to this file) and the
axon relay backend DOES honor it (measured r4: fast-config compile drops
313 s -> 2.2 s warm), so any run after the first in a container gets every
config for free.

Measurement notes:
- Each timed iteration runs REPS=8 *data-dependently chained* forwards in
  one jit (every forward's predicted ids perturb the next one's question
  tokens) and fetches the final ids to the host (np.asarray). The fetched
  values depend on every chained forward, so execution is provably complete
  — while the harness relay's fixed per-dispatch cost (~20-30 ms, which a
  production TPU host does not pay and which dominated the r1 per-call
  numbers) amortizes to ~1/8 per forward. (block_until_ready resolves early
  through the relay, so fetches are the only reliable completion signal;
  queueing multiple executions before a fetch can hang the relay, so the
  loop is strictly serial.)
- Inputs AND params are staged in HBM outside the loop, generated on-device
  by ONE jitted producer (``stage``: params init + both input batches, one
  compile + one dispatch + a scalar fetch). Uploading them would take
  minutes: the harness tunnel's host->device bandwidth is two orders of
  magnitude below a real v5e host link and drops to ~1 MB/s in bad windows —
  the earlier params-npz design (init once on CPU, upload ~50 MB per child)
  measured 61 s for the upload alone in such a window. Including per-batch
  feature upload would benchmark the test tunnel, not the chip; the
  production feed path (packed shards -> prefetch loader -> device_put) is
  exercised in tests and main.py instead.
- If NOTHING lands inside the self-deadline, the parent does not exit
  empty-handed (the r3 failure): it keeps rolling cheap bounded medium/safe
  attempts (overtime, capped at min(VQA_BENCH_OVERTIME_S, 6*DEADLINE_S) —
  see OVERTIME_S below) until one lands or the driver's own window kills
  it — relay windows stall and recover on a minutes scale (a fully-dead
  14-minute window was observed 2026-08-20 minutes after a clean run), so
  patience is strictly better than rc=1. Two guards keep overtime honest:
  a ROUND whose every config dies quickly without a QPS line
  (import/relay-connect crash, not a stall — the f32 safe graph gets its
  try every round as a separate failure surface) backs off 60 s, bounded
  to 4 such rounds — mirroring the safety net's retries<4 bound — and
  when no TPU child has ever completed against this compilation cache
  (the .tpu_warm marker) the first overtime round gets compile-sized
  280 s budgets (a killed compile writes no cache, so 150 s tries against
  a cold graph would burn the whole overtime window with zero chance of
  success).
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

REF_GPU_QPS = 5000.0   # measured CPU floor x documented GPU factor, see docstring
REF_CPU_QPS = 165.0    # measured: eager eval loop, 1 CPU core, this host
TARGET_MULTIPLIER = 5.0

BATCH_SIZE = int(os.environ.get("VQA_BENCH_BATCH", 16384))
WARMUP = 2
ITERS = int(os.environ.get("VQA_BENCH_ITERS", 3))
# 16 chained forwards per fetch: at ~21 ms/forward the ~25 ms relay
# dispatch amortizes to ~0.7% of the number (8 left ~2%) — closer to the
# pure chip rate a production host sees. Still one dispatch per fetch.
REPS = int(os.environ.get("VQA_BENCH_REPS", 16))

# Hard self-imposed wall-clock deadline for the WHOLE bench (parent start ->
# JSON emitted). The driver's window is unknown; round 3 proved it can be
# shorter than 720 s + a safe-config run, so assume ~10 min total and leave
# margin for interpreter startup and the final emit.
DEADLINE_S = float(os.environ.get("VQA_BENCH_DEADLINE_S", 460))
EMIT_MARGIN_S = 20.0    # reserved for parent bookkeeping + final emit
# If the deadline expires with NO result, keep rolling cheap bounded
# attempts until this much total wall has passed (or the driver kills us —
# which captures nothing either way, so overtime risks nothing). NOTE the
# effective cap is min(OVERTIME_S, 6 * DEADLINE_S): overtime scales with
# the deadline so a deliberately tiny-DEADLINE run (tests, smoke) cannot
# spin for 30 min — setting this env var above 6*DEADLINE_S therefore
# requires raising VQA_BENCH_DEADLINE_S too.
OVERTIME_S = float(os.environ.get("VQA_BENCH_OVERTIME_S", 1800))
# Backoff between overtime attempts that died quickly without a QPS line
# (import/relay-connect crash): gives a flaky window time to recover and
# stops back-to-back respawns. Env-tunable only so the crash-bailout
# regression test doesn't have to sleep real minutes.
BACKOFF_S = float(os.environ.get("VQA_BENCH_BACKOFF_S", 60))
# A failed attempt shorter than this is a crash (import ~25 s + an
# immediate error), not a stall. Env-tunable so the regression test can
# raise it and stay deterministic on slow machines (where even the crash
# path can exceed 45 s of interpreter+jax startup).
QUICKFAIL_S = float(os.environ.get("VQA_BENCH_QUICKFAIL_S", 45))
# Minimum budget worth even starting a config attempt (subprocess startup +
# JAX import is ~25 s through this container; a compile needs real time).
MIN_ATTEMPT_S = {"safe": 90.0, "fast": 150.0, "medium": 120.0,
                 "fast32": 180.0}

# Model/problem dims: production reference shapes by default
# (/root/reference/train.py:162-222). Env-overridable ONLY so the test
# suite can pin the B=32768-shaped ladder contract on CPU with tiny dims
# (tests/test_bench.py) — the driver always runs the defaults.
NTOKEN = int(os.environ.get("VQA_BENCH_NTOKEN", 20000))
ANS_DIM = int(os.environ.get("VQA_BENCH_ANS", 3129))
NUM_OBJS = int(os.environ.get("VQA_BENCH_OBJS", 36))
V_DIM = int(os.environ.get("VQA_BENCH_VDIM", 2048))
Q_LEN = int(os.environ.get("VQA_BENCH_QLEN", 10))
EMBED_DIM = int(os.environ.get("VQA_BENCH_EMBED", 300))
HIDDEN_DIM = int(os.environ.get("VQA_BENCH_HIDDEN", 1024))

# Staging-producer HBM guard. Dense generation draws f32 features and
# converts them to the config's feed dtype — which held TWO ~9.7 GB f32
# temps live inside one producer at B=32768 and OOMed v5e HBM in the r4
# driver run (BENCH_r04 tail; the absmax reduce forces the f32 tensor to
# materialize). Above _DENSE_TEMP_LIMIT the producer instead generates
# the feed DIRECTLY in its final dtype (int8 payload from raw uint8
# bits + uniform scales; bf16 normal) — zero f32 temps at any batch, a
# strictly smaller graph (a chunked lax.map variant measured an 895 s
# stage compile through the relay, 2026-08-20 — rejected), and an
# identical consumer-side workload (same shapes/dtypes/FLOPs; synthetic
# VALUES don't change throughput). Below the limit the r4-proven dense
# graph is kept — its compile cache entries are already warm.
# Env-overridable so the CPU tests can force the direct branch at tiny
# dims; 2 f32 batches at B=16384 = 9.7 GB fit a 16 GB v5e.
_DENSE_TEMP_LIMIT = float(os.environ.get("VQA_BENCH_DENSE_LIMIT", 12e9))

_HERE = os.path.dirname(os.path.abspath(__file__))

T0 = time.monotonic()


def log(msg: str) -> None:
    """Phase-progress line on stderr (diagnosable from a captured tail)."""
    print(f"[bench +{time.monotonic() - T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def _build_model(use_pallas: bool):
    from vqa_tpu.models.wrapper import set_model
    return set_model(
        encoder_type="base", predictor_type="base", decoder_type="none",
        ntoken=NTOKEN, v_dim=V_DIM, embed_dim=EMBED_DIM,
        hidden_dim=HIDDEN_DIM, decoder_hidden_dim=512, ans_dim=ANS_DIM,
        c_len=20, dropout=0.2, att_type="new", use_pallas=use_pallas)


def run_config(cfg: str) -> float:
    import jax

    if os.environ.get("VQA_BENCH_PLATFORM") == "cpu":
        # structural testing without the chip: the axon sitecustomize
        # force-sets jax_platforms via config (wins over the env var), so
        # override it back before any backend initializes
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    log(f"child[{cfg}]: jax imported, devices={jax.devices()}")
    model = _build_model(use_pallas=(cfg != "safe"))

    # Stage EVERYTHING on device in one jitted producer: params init + both
    # rotating input batches, one compile + one dispatch + a scalar fetch.
    # Host generation + upload would cost minutes of tunnel time (~130 MB/s
    # good windows, ~1 MB/s bad ones — the earlier params-npz design paid
    # 61 s for its ~50 MB upload in one such window); the only upload here
    # is a PRNG key. Params init uses the use_pallas=False twin — the param
    # tree is identical (routing flags add no params — tested) and the
    # stage graph stays pure XLA. The fast config's quantization matches
    # data/shards.quantize_features (symmetric per-box absmax/127) so the
    # encoder sees the production int8 feed: int8 payload + bf16 scales +
    # lazy-v pooling (models/encoder.py lazy_v) measured 22.9 ms/call vs
    # 31.5 materialized and 33.4 dense bf16, and beats running the GEMM
    # itself in int8 (PERF.md "int8 MXU").
    init_model = model if cfg == "safe" else _build_model(use_pallas=False)

    def _make_batch(key):
        kq, kx = jax.random.split(key)
        q = jax.random.randint(kq, (BATCH_SIZE, Q_LEN), 0, NTOKEN,
                               dtype=jnp.int32)
        b = {"q": q}
        dense_bytes = 2 * BATCH_SIZE * NUM_OBJS * V_DIM * 4
        if cfg == "safe" or dense_bytes <= _DENSE_TEMP_LIMIT:
            # safe: the f32 feed IS the output tensor — nothing to save.
            # fast/medium below the limit: keep the r4-proven dense
            # producer graph (+ its warm cache entries). The fast
            # quantization matches data/shards.quantize_features
            # (symmetric per-box absmax/127), so the encoder sees the
            # production int8 feed.
            x = jax.random.normal(kx, (BATCH_SIZE, NUM_OBJS, V_DIM),
                                  dtype=jnp.float32)
            if cfg == "fast":
                scales = jnp.maximum(jnp.abs(x).max(axis=-1) / 127.0, 1e-8)
                b["img_q"] = jnp.clip(jnp.rint(x / scales[..., None]),
                                      -127, 127).astype(jnp.int8)
                b["img_scale"] = scales.astype(jnp.bfloat16)
            elif cfg == "medium":
                b["img"] = x.astype(jnp.bfloat16)
            else:
                b["img"] = x
            return b, q.sum()
        # fast32-scale batches: generate the feed directly in its final
        # dtype — no f32 temps at any batch size (see _DENSE_TEMP_LIMIT)
        ks, kb = jax.random.split(kx)
        if cfg == "fast":
            bits = jax.random.bits(kb, (BATCH_SIZE, NUM_OBJS, V_DIM),
                                   jnp.uint8)
            b["img_q"] = jnp.clip(
                jax.lax.bitcast_convert_type(bits, jnp.int8), -127, 127)
            # absmax/127 of unit-normal features lands ~[2.5, 4.5]/127
            b["img_scale"] = jax.random.uniform(
                ks, (BATCH_SIZE, NUM_OBJS), jnp.bfloat16,
                minval=2.5 / 127, maxval=4.5 / 127)
        else:  # medium: dense bf16 feed, drawn in bf16
            b["img"] = jax.random.normal(
                kb, (BATCH_SIZE, NUM_OBJS, V_DIM), jnp.bfloat16)
        return b, q.sum()

    @jax.jit
    def stage(key):
        kp, k0, k1 = jax.random.split(key, 3)
        dummy = {"q": jnp.zeros((32, Q_LEN), jnp.int32),
                 "img": jnp.zeros((32, NUM_OBJS, V_DIM), jnp.float32)}
        params = init_model.init(kp, dummy)["params"]
        if cfg != "safe":
            params = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, params)
        b0, tok0 = _make_batch(k0)
        b1, tok1 = _make_batch(k1)
        # tiny data-dependent completion token: fetching it proves this
        # execution finished, so staging never queues a second execution
        # before a fetch (the documented relay-hang trigger)
        return params, b0, b1, tok0 + tok1

    t = time.monotonic()
    params, b0, b1, done = stage(jax.random.key(0))
    np.asarray(done)  # serialize: one in-flight execution at a time
    batches = [b0, b1]
    log(f"child[{cfg}]: on-device staging (params + 2 batches) done "
        f"in {time.monotonic() - t:.1f}s; starting measure compile")

    # REPS forwards are chained inside one jit with a data dependency (each
    # iteration's predicted ids perturb the next iteration's question
    # tokens), and the fetched result depends on every link — as strong a
    # completion proof as per-iteration fetches, but the harness relay's
    # fixed per-dispatch cost (~20-30 ms, absent on a production TPU host)
    # amortizes to ~1/REPS per forward instead of dominating the number.
    def infer_chain(params, batch):
        def step(i, c):
            b = dict(batch, q=(batch["q"] + c[:, None]) % NTOKEN)
            predict, _ = model.apply({"params": params}, b)
            return jnp.argmax(predict, axis=1).astype(jnp.int32)
        return jax.lax.fori_loop(
            0, REPS, step, jnp.zeros((BATCH_SIZE,), jnp.int32))

    # Plain jax.jit ONLY: the AOT ``.lower().compile()`` path returns
    # immediately through this harness's remote-compile relay (compile is
    # deferred) and its first dispatch then HANGS outright — measured
    # 2026-08-19 on a trivial 512x512 graph. Compile time is therefore
    # timed as the first call (compile + first run), which is also what
    # the budget actually pays.
    compiled = jax.jit(infer_chain)
    t = time.monotonic()
    np.asarray(compiled(params, batches[0]))
    log(f"child[{cfg}]: compile+first-run done in {time.monotonic() - t:.1f}s")

    for i in range(1, WARMUP):
        np.asarray(compiled(params, batches[i % 2]))
    log(f"child[{cfg}]: warmup done, measuring")

    start = time.perf_counter()
    for i in range(ITERS):
        labels = np.asarray(compiled(params, batches[i % 2]))
    elapsed = time.perf_counter() - start
    assert labels.shape == (BATCH_SIZE,)
    qps = BATCH_SIZE * REPS * ITERS / elapsed
    log(f"child[{cfg}]: measured {qps:.1f} q/s")
    return qps


def emit(qps: float, cfg: str) -> None:
    log(f"emitting result: {qps:.1f} q/s ({cfg} config)")
    print(json.dumps({
        "metric": "vqa_updown_batch_inference_questions_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "questions/s",
        "vs_baseline": round(qps / (TARGET_MULTIPLIER * REF_GPU_QPS), 3),
    }), flush=True)


def attempt(cfg: str, budget_s: float) -> float | None:
    """Run one config in a watchdogged subprocess; return qps or None."""
    here = os.path.dirname(os.path.abspath(__file__))
    env = dict(
        os.environ, VQA_BENCH_CONFIG=cfg,
        PYTHONPATH=here + os.pathsep + os.environ.get("PYTHONPATH", ""),
        # persist compiled graphs across attempts/runs when honored
        JAX_COMPILATION_CACHE_DIR=os.environ.get(
            "JAX_COMPILATION_CACHE_DIR", os.path.join(here, ".jax_cache")),
    )
    if cfg == "fast32":  # the fast config at B=32768 (see main())
        env["VQA_BENCH_CONFIG"] = "fast"
        env["VQA_BENCH_BATCH"] = "32768"
    log(f"attempting config '{cfg}' with budget {budget_s:.0f}s")
    proc = subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                            env=env, stdout=subprocess.PIPE, stderr=None,
                            text=True, start_new_session=True)
    try:
        out, _ = proc.communicate(timeout=budget_s)
    except subprocess.TimeoutExpired:
        # SIGTERM first: a SIGKILLed client wedges the relay for ~60 s
        # (PERF.md quirks), taxing whichever rung runs next; a clean
        # interpreter exit closes the relay connection properly. Escalate
        # after a 5 s grace (a child truly stuck inside a relay RPC never
        # runs its signal handler).
        log(f"config '{cfg}' hit its {budget_s:.0f}s watchdog; killing")
        try:
            os.killpg(os.getpgid(proc.pid), signal.SIGTERM)
            proc.wait(timeout=5)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            except (ProcessLookupError, PermissionError, OSError):
                proc.kill()
        except (ProcessLookupError, PermissionError, OSError):
            proc.kill()
        proc.wait()
        return None
    for line in (out or "").splitlines():
        if line.startswith("QPS "):
            if os.environ.get("VQA_BENCH_PLATFORM") != "cpu":
                # record that a TPU child completed against this cache:
                # cache FILENAMES cannot distinguish TPU graphs from the
                # entries CPU test children write into the same dir, so
                # 'warm' budget decisions trust only this marker
                try:
                    os.makedirs(env["JAX_COMPILATION_CACHE_DIR"],
                                exist_ok=True)
                    with open(os.path.join(
                            env["JAX_COMPILATION_CACHE_DIR"],
                            ".tpu_warm"), "w"):
                        pass
                except OSError:
                    pass
            return float(line.split()[1])
    log(f"config '{cfg}' exited rc={proc.returncode} without a QPS line")
    return None


def main():
    cfg = os.environ.get("VQA_BENCH_CONFIG", "")
    if cfg:  # child process: run one configuration and print the raw qps
        print(f"QPS {run_config(cfg):.1f}", flush=True)
        return

    def remaining() -> float:
        return DEADLINE_S - (time.monotonic() - T0) - EMIT_MARGIN_S

    best: tuple[float, str] | None = None

    # Window quality is roulette: the SAME cached medium graph compiled in
    # 5.8 s and stalled past 240 s within minutes of each other
    # (2026-08-19); a fully-dead 14-minute window followed a clean run by
    # minutes (2026-08-20). Staging is one cached compile + one dispatch,
    # so attempts are cheap — when the compilation cache already holds
    # infer_chain graphs, run SHORT watchdogs with a retry instead of one
    # long try: two bounded tries survive one stalled window at the same
    # total budget. A cold cache gets one long try (a killed compile
    # writes nothing, so restarts don't accumulate).
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(_HERE, ".jax_cache"))
    if os.environ.get("VQA_BENCH_PLATFORM") == "cpu":
        # CPU (test) runs: cache filenames are trustworthy — only CPU
        # children write here in that mode
        warm = os.path.isdir(cache_dir) and any(
            f.startswith("jit_infer_chain") for f in os.listdir(cache_dir))
    else:
        # TPU runs: filenames can't distinguish CPU-test-written entries
        # from TPU graphs; trust only the marker a successful TPU child
        # leaves behind (attempt())
        warm = os.path.exists(os.path.join(cache_dir, ".tpu_warm"))
    log(f"compilation cache {'warm' if warm else 'cold'} at {cache_dir}")

    # Rung 1: medium first — the bf16+Pallas graph worth 1.55x the f32
    # rate; r4 it landed 4/4 while f32 safe stalled 2/4. 150 s tries, not
    # 120: "warm" is detected from infer_chain cache entries, but the
    # STAGE graph can still be cold (measured 2026-08-20: import ~25 s +
    # cold stage compile ~98 s + measure ~10 s = ~131 s — a 120 s try
    # loses a child that was about to land).
    for i, watchdog in enumerate((150.0, 150.0) if warm else (240.0,)):
        # the FIRST try always gets its MIN floor even when the deadline
        # is already blown — something must be attempted (the r3 lesson);
        # only the retry is conditional on time actually remaining
        if i and remaining() < MIN_ATTEMPT_S["medium"]:
            break
        qps = attempt("medium", min(
            watchdog, max(MIN_ATTEMPT_S["medium"], remaining())))
        if qps:
            best = (qps, "medium")
            break

    def fast32_ok() -> bool:
        return ("VQA_BENCH_BATCH" not in os.environ           # default shape
                and os.environ.get("VQA_BENCH_PLATFORM") != "cpu")

    # Rung 2: fast32 — since round 5 the TOP-value rung (941.1k vs fast's
    # 890k, same window) and usually the cheaper one: the direct-dtype
    # stage killed the old staging OOM/compile pathology (~51 s cold /
    # ~2 s warm, B=32768 infer graph cached), while fast's B=16384
    # staging dispatch blew a 240 s watchdog in 2 of 3 ladder windows
    # today. It still runs only once a number is already held (medium is
    # the anchor) and with a reserve so a stall leaves room for a fast
    # attempt.
    fast32_qps = None   # a MEASURED fast32 number (even if it lost)
    if (best and remaining() - 110.0 >= MIN_ATTEMPT_S["fast32"]
            and fast32_ok()):
        fast32_qps = attempt("fast32", min(240.0, remaining() - 110.0))
        if fast32_qps and fast32_qps > best[0]:
            best = (fast32_qps, "fast32")

    # Rung 3: fast — the B=16384 variant; worth -4..6% vs fast32 in the
    # same window, so it runs only if fast32 has not MEASURED (a fast32
    # number that lost to medium still counts: this window already
    # showed the big-batch economics slower, so re-measuring variants of
    # it wastes budget). Bounded so one stall leaves room for the safety
    # net, minus a reserve when NOTHING has landed yet (fast's compile
    # is the variable one: 62-313 s observed cold for the same graph,
    # ~2 s warm).
    if not fast32_qps:
        for watchdog in ((240.0, 150.0) if warm else (300.0,)):
            budget = min(watchdog, remaining() - (0.0 if best else 110.0))
            if budget < MIN_ATTEMPT_S["fast"]:
                log(f"skipping 'fast' config: only {remaining():.0f}s left")
                break
            qps = attempt("fast", budget)
            if qps:
                if not best or qps > best[0]:
                    best = (qps, "fast")
                break

    # Second chance for the top rung: if fast32 never MEASURED (its slot
    # stalled, or medium had not landed yet to anchor it) but a number
    # is held and time remains, retry once — a hang burns leftover time,
    # never the result.
    if (best and not fast32_qps
            and remaining() >= MIN_ATTEMPT_S["fast32"] and fast32_ok()):
        qps = attempt("fast32", remaining())
        if qps and qps > best[0]:
            best = (qps, "fast32")

    # Safety net: if nothing has landed, roll the f32 safe graph (a
    # DIFFERENT graph and failure surface than the bf16/Pallas rungs),
    # then re-roll medium, with whatever time is left — a later window
    # often recovers. Bounded retries so an instant-crash failure mode
    # cannot spin.
    retries = 0
    while not best and retries < 4 and remaining() >= MIN_ATTEMPT_S["safe"]:
        retries += 1
        for cfg in ("safe", "medium"):
            if remaining() < MIN_ATTEMPT_S[cfg]:
                continue
            qps = attempt(cfg, remaining())
            if qps:
                best = (qps, cfg)
                break

    # Overtime: the deadline is for trading rungs against each other, not
    # for giving up. If NOTHING landed (a fully-stalled relay window), keep
    # rolling cheap bounded medium/safe attempts until something lands or
    # min(OVERTIME_S, 6*DEADLINE_S) total wall passes (the 6x term keeps a
    # tiny-DEADLINE test run from spinning; see OVERTIME_S) — if the
    # driver's window is longer than our deadline this can still capture a
    # number, and if the driver kills us mid-attempt we are exactly where
    # rc=1 would have left us. Guards: (a) a child that dies QUICKLY
    # without a QPS line is a crash (import/relay-connect error), not a
    # stall — back off 60 s so the window can recover and bail after 4
    # consecutive, mirroring the safety net's retries<4 bound; (b) a cold
    # compilation cache gets a compile-sized first budget (cold stage
    # compile ~98 s + ~25 s import: a 150 s watchdog kills the child
    # mid-compile, a killed compile writes no cache, and the whole
    # overtime window burns with zero chance of success).
    quick_fails = 0
    overtime_round = 0
    while (not best and quick_fails < 4
           and time.monotonic() - T0 < min(OVERTIME_S, 6 * DEADLINE_S)):
        overtime_round += 1
        log("overtime: nothing landed yet; re-rolling bounded attempts")
        # Budget: the cache-FILENAME warm heuristic can be fooled by
        # entries the CPU test children wrote into the same dir, so here
        # only the .tpu_warm marker (a TPU child completed against this
        # cache — written by attempt()) earns short budgets; otherwise
        # the FIRST round gets compile-sized ones (a killed compile
        # writes no cache, so short tries against a cold graph would
        # burn the whole window with zero chance of success).
        tpu_warm = os.path.exists(os.path.join(cache_dir, ".tpu_warm"))
        budget = 150.0 if (tpu_warm or overtime_round > 1) else 280.0
        round_quick = True   # every failure this round was a fast crash
        for cfg in ("medium", "safe"):
            t_at = time.monotonic()
            qps = attempt(cfg, budget)
            if qps:
                best = (qps, cfg)
                break
            if time.monotonic() - t_at >= QUICKFAIL_S:
                round_quick = False   # a stall, not a crash
        if best:
            break
        # BOTH configs failed this round (the f32 safe graph gets its
        # try every round — it is a different failure surface than the
        # bf16/Pallas medium graph and exists for exactly this case). A
        # round of pure fast crashes (import/relay-connect errors) backs
        # off and counts toward the bail bound; a round containing a
        # genuine stall resets it.
        if round_quick:
            quick_fails += 1
            log(f"overtime round died quickly on every config "
                f"({quick_fails}/4 quick-failure rounds); backing off "
                f"{BACKOFF_S:.0f}s")
            time.sleep(BACKOFF_S)
        else:
            quick_fails = 0

    if best:
        emit(*best)
    else:
        log("FAILED: no config produced a number inside the deadline")
        sys.exit(1)


if __name__ == "__main__":
    main()
