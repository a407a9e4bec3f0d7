"""Benchmark harness — prints cumulative JSON lines for the driver.

Headline metric: FastSpeech2 batch-1 NAR synthesis RTF measured
SINGLE-SHOT — median wall time of one isolated dispatch+synth+host-
readback, including the platform's fixed ~30-40 ms sync overhead. This
is the test_fastspeech2.py:203-204 equivalent (what a caller actually
waits). The marginal slope cost per chained utterance is kept as
``rtf_marginal``.

TIMEOUT-PROOFING (round-5 rewrite — BENCH_r04 was rc=124/parsed:null
because a single JSON line was printed only at the very end):

* The results dict is CUMULATIVE and re-printed as a full JSON line
  after every section. The driver's tail capture therefore always holds
  the latest complete superset: a timeout in section k preserves
  sections 1..k-1. The final line is the line of record.
* A global wall-clock budget (default 450 s, env BENCH_BUDGET_S) gates
  each section by a conservative cost estimate; sections that don't fit
  are recorded in ``"skipped"`` instead of dying silently.
* The PyTorch-CPU denominator (BASELINE.md's ">=5x PyTorch-CPU" target)
  is memoized to the committed ``bench_cache/torch_cpu.json`` — it is
  hardware-stable (keyed on cpu_count), and re-measuring it on a 1-core
  host costs minutes per run.
* The per-family train-step matrix runs at a reduced 16x512 bucket
  (relative ordering across families is what it exists to show) with
  one shared FS2 init reused as the mel-mel teacher.

Parity config: d_model 384, 6+6 layers, 4 heads, mel 80
(utils/default.yaml); 22.05 kHz, hop 256 (LJSpeech framing,
BASELINE.json config #1). Durations teacher-forced to 6 frames/phone so
the audio denominator is defined for an untrained net.

TIMING METHODOLOGY (round-2 rewrite — the round-1 numbers were invalid):
on this environment's 'axon' JAX platform, ``block_until_ready`` returns
BEFORE device execution completes, so naive wall-clock timing measures
dispatch, not compute. Every quantity here is therefore

* closed by a device->host transfer (``float(scalar)``), which does
  block, and
* measured as the SLOPE between 1 and N data-dependency-chained
  iterations: per_iter = (T(N) - T(1)) / (N - 1). The chain (each
  iteration's input depends on the previous iteration's output) forces
  sequential device execution; the slope subtracts the platform's fixed
  ~30-40 ms host-sync overhead. Each T(k) is the median of >=7 runs.

A physical-plausibility guard computes implied FLOP/s from XLA's own
``cost_analysis()`` and ERRORS OUT if it exceeds the chip's peak — the
check that would have caught the round-1 60-150x inflation.

vs_baseline: target RTF is 0.01 (BASELINE.md north-star); the ratio
reported is target/measured, so > 1.0 beats the target.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

from transformer_tts_tpu.bench_utils import (
    check_plausible, slope_time, xla_flops)

FRAME_SECONDS = 256 / 22050.0     # LJSpeech hop/sr
TARGET_RTF = 0.01                 # BASELINE.md
_T0 = time.perf_counter()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "500"))
_TORCH_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "bench_cache", "torch_cpu.json")

RESULTS: dict = {}


def _remaining() -> float:
    return _BUDGET_S - (time.perf_counter() - _T0)


def _emit() -> None:
    """Re-print the full cumulative results as one JSON line.

    Each emission is a superset of the previous one, so whatever line
    the driver's tail capture last sees is complete and parseable.
    """
    print(json.dumps(RESULTS))
    sys.stdout.flush()


def _section(name: str, est_s: float, fn) -> bool:
    """Run one bench section under the global budget.

    Skips (and records) the section if the remaining budget is below
    ``est_s``; converts unexpected exceptions into an ``"errors"`` entry
    instead of destroying already-measured sections. The plausibility
    guard still hard-exits (SystemExit propagates).
    """
    if _remaining() < est_s:
        RESULTS.setdefault("skipped", []).append(name)
        _emit()
        return False
    t0 = time.perf_counter()
    try:
        fn()
    except SystemExit:
        raise
    except Exception as e:                        # pragma: no cover
        RESULTS.setdefault("errors", {})[name] = (
            f"{type(e).__name__}: {e}"[:300])
    # per-section wall cost: the budget diagnostic (r4 timed out blind)
    RESULTS.setdefault("sec_s", {})[name] = round(
        time.perf_counter() - t0, 1)
    _emit()
    return True


def _torch_cpu_frames_per_sec(b=4, lt=64, tt=1024):
    """Measured PyTorch-CPU denominator for the >=5x BASELINE.md target.

    Runs the ACTUAL reference FastSpeech2 (imported from
    /root/reference, train_fastspeech2.py semantics: fwd + the five L1
    losses + backward + Adam step) at the parity config (d_model 384,
    6+6 layers, 4 heads, mel 80) on CPU, and returns mel frames/sec.
    Batch 4 x 1024 frames — CPU throughput is ~batch-size-flat at this
    size, and a full 32-batch step would take minutes per step.
    """
    import os as _o
    import sys as _s
    import time as _t
    import types as _ty
    _s.modules.setdefault("itsdangerous",
                          _ty.SimpleNamespace(NoneAlgorithm=None))
    if "/root/reference" not in _s.path:
        _s.path.append("/root/reference")
    import torch
    from Models.fastspeech2 import FastSpeech2 as TorchFS2
    from transformer_tts_tpu.config import HParams
    torch.set_num_threads(_o.cpu_count() or 1)
    hp = HParams(amp=False, batch_size=b)

    class _RefHP:
        encoder_type = "transformer"
        decoder_type = "transformer"
        use_sq_vae = False
        use_hop = False
        use_rnn_length = False
        use_pos = False
        postnet_pred = True
        p_scheduled_sampling = 0.0
        version = None
        semantic_mask = False

    model = TorchFS2(
        _RefHP(), src_vocab=hp.vocab_size, trg_vocab=hp.mel_dim,
        d_model_encoder=hp.d_model_encoder, N_e=hp.n_layer_encoder,
        n_head_encoder=hp.n_head_encoder,
        ff_conv_kernel_size_encoder=hp.ff_conv_kernel_size_encoder,
        concat_after_encoder=False,
        d_model_decoder=hp.d_model_decoder, N_d=hp.n_layer_decoder,
        n_head_decoder=hp.n_head_decoder,
        ff_conv_kernel_size_decoder=hp.ff_conv_kernel_size_decoder,
        concat_after_decoder=False, reduction_rate=1, dropout=0.1,
        dropout_postnet=0.5, dropout_variance_adaptor=0.5, n_bins=256,
        f0_min=71.0, f0_max=795.8, energy_min=0.0, energy_max=315.0,
        pitch_pred=True, energy_pred=True, accent_emb=False,
        multi_speaker=False, spk_emb_dim=None, spk_emb_architecture=(),
        debug=False)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    l1 = torch.nn.L1Loss()
    rs = np.random.RandomState(0)
    text = torch.tensor(rs.randint(1, hp.vocab_size, (b, lt)),
                        dtype=torch.int64)
    src_mask = torch.ones((b, 1, lt), dtype=torch.bool)
    mel_mask = torch.ones((b, 1, tt), dtype=torch.bool)
    d_target = torch.full((b, lt), tt // lt, dtype=torch.int64)
    mel = torch.tensor(rs.randn(b, tt, hp.mel_dim), dtype=torch.float32)
    f0 = torch.tensor(rs.rand(b, tt) * 300, dtype=torch.float32)
    energy = torch.tensor(rs.rand(b, tt) * 100, dtype=torch.float32)

    def step():
        opt.zero_grad()
        out = model(text, src_mask, mel_mask, d_target, f0, energy,
                    None, spkr_emb=None, fix_mask=None, temperature=None)
        pre, post, logd, pitch, eng = out[0], out[1], out[2], out[3], out[4]
        loss = (l1(pre, mel) + l1(post, mel)
                + l1(logd, torch.log(d_target.float() + 1.0))
                + l1(pitch, f0) + l1(eng, energy))
        loss.backward()
        opt.step()

    step()                              # warmup (allocs, autotune)
    t0 = _t.perf_counter()
    n = 2
    for _ in range(n):
        step()
    per = (_t.perf_counter() - t0) / n
    return b * tt / per, torch.__version__


def _torch_cpu_denominator(max_measure_s: float):
    """Cached-or-measured torch-CPU frames/sec.

    The value is hardware-stable: memoized to bench_cache/torch_cpu.json
    keyed on cpu_count (torch version recorded for honesty). Measuring
    fresh is only attempted when ``max_measure_s`` budget remains.
    Returns (frames_per_sec | None, source_str).
    """
    cpus = os.cpu_count() or 1
    try:
        with open(_TORCH_CACHE) as fh:
            cached = json.load(fh)
        if cached.get("cpus") == cpus and cached.get("frames_per_sec"):
            return float(cached["frames_per_sec"]), "cache"
    except (OSError, ValueError):
        pass
    if max_measure_s < 120.0:
        return None, "skipped(no-cache,no-budget)"
    fps, torch_ver = _torch_cpu_frames_per_sec()
    try:
        os.makedirs(os.path.dirname(_TORCH_CACHE), exist_ok=True)
        with open(_TORCH_CACHE, "w") as fh:
            json.dump({"frames_per_sec": fps, "cpus": cpus,
                       "torch": torch_ver, "b": 4, "lt": 64, "tt": 1024,
                       "note": "reference FS2 fwd+5xL1+bwd+Adam on CPU"},
                      fh, indent=1)
    except OSError:                               # pragma: no cover
        pass
    return fps, "measured"


def _plausibility_guard(name, flops, seconds):
    if flops <= 0 or seconds <= 0:
        return None
    try:
        return check_plausible(name, flops, seconds)
    except RuntimeError as e:
        print(json.dumps({
            "metric": "BENCH_INVALID", "value": -1.0, "unit": "error",
            "vs_baseline": 0.0, "error": str(e),
        }))
        sys.exit(1)


def main():
    from transformer_tts_tpu.bench_utils import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from transformer_tts_tpu.config import HParams
    from transformer_tts_tpu.ops.masks import create_masks
    from transformer_tts_tpu.train.trainer import (
        init_fastspeech2_state, make_fastspeech2_train_step)

    RESULTS["timing"] = "host-synced slope, median of >=7 runs"
    RESULTS["device"] = str(jax.devices()[0])
    # emit a parseable stub IMMEDIATELY: on a degraded/contended
    # platform even the setup compiles can eat the whole driver budget
    # (observed 2026-08-21: a trivial 1024^3 matmul took 60 s end to
    # end), and with no line at all the round records parsed:null. The
    # stub names the failure mode; every later section overwrites it.
    RESULTS.update({"metric": "bench_setup_incomplete", "value": 0.0,
                    "unit": "stub", "vs_baseline": 0.0})
    _emit()

    hp = HParams(amp=True, batch_size=16)
    rng = jax.random.PRNGKey(0)
    model, state = init_fastspeech2_state(hp, rng)
    RESULTS["setup_s"] = round(time.perf_counter() - _T0, 1)

    # ---------------- synthesis RTF (batch=1) ----------------
    l, t = 128, 768               # 128 phones x 6 frames -> ~8.9 s audio
    rs = np.random.RandomState(0)
    text = jnp.asarray(rs.randint(1, hp.vocab_size, (1, l)).astype(np.int32))
    pos_text = jnp.tile(jnp.arange(1, l + 1)[None], (1, 1))
    src_mask, _ = create_masks(pos_text, None)
    d_target = jnp.full((1, l), t // l, jnp.int32)

    @jax.jit
    def synth(params, batch_stats, text, src_mask, d_target, carry):
        # carry couples successive calls into a sequential chain
        text = text + (carry * 0).astype(jnp.int32)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats, "vq_stats": {}},
            text, src_mask, t, d_target, train=False)
        return jnp.sum(out.mel_post)   # scalar: host-transfer closes timing

    def synth_chain(k):
        carry = jnp.zeros((), jnp.float32)
        for _ in range(k):
            carry = synth(state.params, state.batch_stats, text, src_mask,
                          d_target, carry)
        return float(carry)            # blocking device->host transfer

    def sec_headline():
        synth_chain(2)                 # compile + warm
        r = slope_time(synth_chain, 16)
        synth_s, synth_t1, synth_s_min = r.per_iter, r.t1, r.per_iter_min
        audio_seconds = t * FRAME_SECONDS
        rtf_marginal = synth_s / audio_seconds
        synth_flops = xla_flops(
            synth, state.params, state.batch_stats, text, src_mask,
            d_target, jnp.zeros((), jnp.float32))
        _plausibility_guard("synthesis", synth_flops, synth_s)

        # single-shot: one isolated call, host-closed — what a caller
        # waits (includes the platform's fixed sync;
        # test_fastspeech2.py:203-204)
        singles = []
        for _ in range(15):
            t0 = time.perf_counter()
            synth_chain(1)
            singles.append(time.perf_counter() - t0)
        single_s = float(np.median(singles))
        rtf = single_s / audio_seconds
        RESULTS.update({
            "metric": "fastspeech2_synthesis_rtf_single_shot",
            "value": round(rtf, 6),
            "unit": "rtf",
            "vs_baseline": round(TARGET_RTF / rtf, 3),
            "single_shot_ms": round(single_s * 1000, 3),
            "rtf_marginal": round(rtf_marginal, 6),
            "synth_ms_per_utt_marginal": round(synth_s * 1000, 3),
            "synth_ms_per_utt_min": round(synth_s_min * 1000, 3),
            "sync_overhead_ms": round(
                max(synth_t1 - synth_s, 0.0) * 1000, 1),
        })

    _section("headline_synth", 0.0, sec_headline)   # always runs

    # ---------------- training throughput ----------------
    b, lt, tt = 32, 64, 1024      # 32768 mel frames per step
    batch = {
        "text": jnp.asarray(
            rs.randint(1, hp.vocab_size, (b, lt)).astype(np.int32)),
        "pos_text": jnp.tile(jnp.arange(1, lt + 1)[None], (b, 1)),
        "mel": jnp.asarray(rs.randn(b, tt, hp.mel_dim).astype(np.float32)),
        "pos_mel": jnp.tile(jnp.arange(1, tt + 1)[None], (b, 1)),
        "alignment": jnp.full((b, lt), tt // lt, jnp.int32),
        "f0": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 300),
        "energy": jnp.asarray(rs.rand(b, tt).astype(np.float32) * 100),
    }

    def sec_train():
        step_fn = make_fastspeech2_train_step(model, hp, donate=False)
        # production default: rbg dropout keys (config.py prng_impl)
        step_rng = jax.random.key(1, impl=hp.prng_impl)

        def train_chain(k):
            # state threads through: iteration i+1 depends on iteration i
            s = state
            logs = None
            for _ in range(k):
                s, logs = step_fn(s, batch, step_rng)
            return float(logs["loss_total"])

        train_chain(2)                 # compile + warm
        r = slope_time(train_chain, 8)
        step_s, step_s_min = r.per_iter, r.per_iter_min
        frames_per_sec = (b * tt) / step_s
        train_flops = xla_flops(step_fn, state, batch, step_rng)
        # XLA cost_analysis() assigns ZERO flops to tpu_custom_call, so
        # the Pallas flash-attention matmuls — the step's O(T^2) term —
        # vanish from its count. Verified: compiling the identical step
        # with use_flash_attention=False raises the count by 0.963
        # TFLOP, matching the analytic dense attention count below
        # (0.928; scripts/flops_accounting.py). Add back exactly what
        # the kernel executes at this shape: decoder self-attention only
        # (encoder T=64 and cross-attention k_len=64 are under the
        # flash dispatch threshold and stay XLA-counted), full-dense
        # T^2 (block_k=1024 -> one k block, no causal block skipping),
        # bwd counted at 2x fwd — the same convention cost_analysis
        # applies to the jnp path (recompute NOT counted, conservative).
        heads = hp.n_head_decoder
        d_k = hp.d_model_decoder // heads
        attn_fwd = 2 * 2 * b * heads * tt * tt * d_k
        flash_flops = 3 * attn_fwd * hp.n_layer_decoder
        train_tflops = _plausibility_guard(
            "train_step", train_flops + flash_flops, step_s)
        xla_only_tflops = _plausibility_guard("train_step_xla",
                                              train_flops, step_s)
        RESULTS.update({
            "train_mel_frames_per_sec_per_chip": round(frames_per_sec, 1),
            "train_step_ms": round(step_s * 1000, 2),
            "train_step_ms_min": round(step_s_min * 1000, 2),
            "train_implied_tflops": (round(train_tflops, 1)
                                     if train_tflops else None),
            # r2-r4 continuity: the uncorrected (custom-call-blind) rate
            "train_xla_counted_tflops": (round(xla_only_tflops, 1)
                                         if xla_only_tflops else None),
        })

    _section("train", 30.0, sec_train)

    # ------------- PyTorch-CPU reference denominator -------------
    # BASELINE.md's ">=5x PyTorch-CPU" target. Cached in the committed
    # bench_cache/torch_cpu.json; measured fresh only if absent AND the
    # budget allows (minutes on a 1-core host). Placed right after the
    # training section so vs_torch_cpu survives any later timeout.
    def sec_torch_cpu():
        fps, src = _torch_cpu_denominator(
            max_measure_s=_remaining() - 120.0)
        RESULTS["torch_cpu_frames_per_sec"] = (round(fps, 1)
                                               if fps else None)
        RESULTS["torch_cpu_source"] = src
        ours = RESULTS.get("train_mel_frames_per_sec_per_chip")
        if fps and ours:
            RESULTS["vs_torch_cpu"] = round(ours / fps, 1)

    _section("torch_cpu", 1.0, sec_torch_cpu)

    # ---------------- per-family train-step matrix ----------------
    # Every trainable family at a SHARED REDUCED 16x512-frame bucket
    # (r4 verdict: the 32x1024 matrix was 9 extra full-size AOT
    # compiles and timed the whole bench out; relative ordering across
    # families is what this matrix exists to show). Values are mel
    # frames/sec/chip at that bucket — NOT comparable to the headline
    # 32x1024 number.
    def sec_families():
        from transformer_tts_tpu.train import post_trainers as PT
        from transformer_tts_tpu.train import trainer as TR
        fb, flt, ftt = 16, 32, 512
        fbatch = {
            "text": jnp.asarray(
                rs.randint(1, hp.vocab_size, (fb, flt)).astype(np.int32)),
            "pos_text": jnp.tile(jnp.arange(1, flt + 1)[None], (fb, 1)),
            "mel": jnp.asarray(
                rs.randn(fb, ftt, hp.mel_dim).astype(np.float32)),
            "pos_mel": jnp.tile(jnp.arange(1, ftt + 1)[None], (fb, 1)),
            "alignment": jnp.full((fb, flt), ftt // flt, jnp.int32),
            "f0": jnp.asarray(rs.rand(fb, ftt).astype(np.float32) * 300),
            "energy": jnp.asarray(
                rs.rand(fb, ftt).astype(np.float32) * 100),
        }
        ar_batch = dict(fbatch)
        ar_batch["stop_token"] = jnp.zeros(
            (fb, ftt), jnp.float32).at[:, -1].set(1.0)
        RESULTS["family_bucket"] = f"{fb}x{ftt}"

        def _time_train(step_fn, st, bch, key):
            def chain(k):
                s, logs = st, None
                for _ in range(k):
                    s, logs = step_fn(s, bch, key)
                return float(logs["loss_total"])
            chain(2)
            return slope_time(chain, 3, repeats=3).per_iter

        fam_cfgs = (
            ("fs2", dict(), "fs2"),
            ("ar_transformer", dict(model="Transformer", reduction_rate=2,
                                    ff_conv_kernel_size_decoder=1), "ar"),
            ("tacotron2", dict(model="Transformer", reduction_rate=2,
                               decoder_type="tacotron2"), "ar"),
            ("sq", dict(model="SQFastspeech2"), "sq"),
            ("melmel", dict(architecture="mel-mel", version=3,
                            mel_dim_post=80, n_layer_post_model=6),
             "melmel"),
            ("melmel_pregen", dict(architecture="mel-mel", version=3,
                                   mel_dim_post=80, n_layer_post_model=6,
                                   teacher_suffix="_gen"),
             "melmel_pregen"),
            ("integrate", dict(architecture="text-mel-mel", version=3,
                               mel_dim_post=80, n_layer_post_model=6),
             "integrate"),
            # conformer LAST: its rel-pos Pallas kernel is by far the
            # slowest cold compile of the matrix — a timeout mid-compile
            # then costs only this one row, not the rows behind it
            ("conformer", dict(encoder_type="conformer",
                               decoder_type="conformer"), "fs2"),
        )
        # one shared FS2 init, reused for the plain-fs2 row and as the
        # frozen mel-mel teacher (identical arch at these hparams)
        hp_fs2 = HParams(amp=True, batch_size=fb)
        fs2_model, fs2_state = TR.init_fastspeech2_state(hp_fs2, rng)
        for fname, kw, kind in fam_cfgs:
            if _remaining() < 35.0:
                RESULTS.setdefault("skipped", []).append(
                    f"family:{fname}")
                _emit()
                continue
            try:
                hp_f = HParams(amp=True, batch_size=fb, **kw)
                fkey = jax.random.key(1, impl=hp_f.prng_impl)
                if kind == "fs2" and not kw:
                    m_f, s_f = fs2_model, fs2_state
                    stp = TR.make_fastspeech2_train_step(m_f, hp_f,
                                                         donate=False)
                    bch = fbatch
                elif kind == "fs2":
                    m_f, s_f = TR.init_fastspeech2_state(hp_f, rng)
                    stp = TR.make_fastspeech2_train_step(m_f, hp_f,
                                                         donate=False)
                    bch = fbatch
                elif kind == "ar":
                    m_f, s_f = TR.init_transformer_state(hp_f, rng)
                    stp = TR.make_transformer_train_step(m_f, hp_f,
                                                         donate=False)
                    bch = ar_batch
                elif kind == "sq":
                    m_f, s_f = TR.init_sq_fastspeech2_state(hp_f, rng)
                    stp = TR.make_sq_fastspeech2_train_step(
                        m_f, hp_f, donate=False)
                    bch = fbatch
                elif kind == "melmel":
                    t_vars = {"params": fs2_state.params,
                              "batch_stats": fs2_state.batch_stats,
                              "vq_stats": fs2_state.vq_stats}
                    m_f, s_f = PT.init_post_state(hp_f, rng, fs2_model)
                    stp = PT.make_meltomel_train_step(
                        fs2_model, t_vars, m_f, hp_f, donate=False)
                    bch = fbatch
                elif kind == "melmel_pregen":
                    # pregenerated-corpus variant: no teacher forward
                    # in the step (hp.teacher_suffix workflow)
                    m_f, s_f = PT.init_post_state(hp_f, rng, None)
                    stp = PT.make_meltomel_pregen_train_step(
                        m_f, hp_f, donate=False)
                    bch = dict(fbatch,
                               teacher_mel=fbatch["mel"],
                               teacher_phone=jnp.zeros(
                                   (fb, ftt, hp_f.d_model_encoder),
                                   jnp.float32))
                else:
                    m_f, s_f = TR.init_fastspeech2_state(
                        hp_f, rng, enable_post_model=True)
                    stp = PT.make_integrate_train_step(m_f, hp_f,
                                                       donate=False)
                    bch = fbatch
                per = _time_train(stp, s_f, bch, fkey)
                RESULTS[f"train_{fname}_frames_per_sec"] = round(
                    fb * ftt / per, 1)
            except Exception as e:            # pragma: no cover
                RESULTS.setdefault("errors", {})[f"family:{fname}"] = (
                    f"{type(e).__name__}: {e}"[:200])
            _emit()

    # ---------------- AR Transformer-TTS synthesis RTF ----------------
    # KV-cached incremental decode; the reference's loop re-forwards the
    # whole prefix each step (test.py:158-184). Untrained stop heads
    # never fire; stop_threshold > 1 forces the worst case: all steps.
    def sec_ar():
        from transformer_tts_tpu.infer.synthesize import (
            synthesize_transformer_tts)
        from transformer_tts_tpu.train.trainer import (
            init_transformer_state)
        hp_ar = HParams(model="Transformer", amp=True, batch_size=8,
                        reduction_rate=2)
        ar_model, ar_state = init_transformer_state(hp_ar, rng)
        ar_vars = {"params": ar_state.params,
                   "batch_stats": ar_state.batch_stats}
        ar_steps = 250                   # 500 frames at r=2
        ar_text = jnp.asarray(
            rs.randint(1, hp_ar.vocab_size, (1, l)).astype(np.int32))
        ar_pos = jnp.tile(jnp.arange(1, l + 1)[None], (1, 1))

        def ar_chain(k):
            txt = ar_text
            mel_sum = jnp.zeros((), jnp.float32)
            for _ in range(k):
                txt = ar_text + (mel_sum * 0).astype(jnp.int32)
                mel_ar, _ = synthesize_transformer_tts(
                    ar_model, ar_vars, txt, ar_pos, max_steps=ar_steps,
                    stop_threshold=2.0)
                mel_sum = jnp.sum(mel_ar)
            return float(mel_sum)

        ar_chain(1)                      # compile + warm
        r = slope_time(ar_chain, 6, repeats=7)
        ar_s = r.per_iter
        ar_frames = ar_steps * hp_ar.reduction_rate
        RESULTS.update({
            "ar_synthesis_rtf": round(ar_s / (ar_frames * FRAME_SECONDS),
                                      5),
            "ar_ms_per_step": round(ar_s / ar_steps * 1000, 3),
        })

    # ar_synth BEFORE the family matrix: ar_synthesis_rtf is an r3
    # headline key; the matrix is breadth and must not starve it
    # family matrix BEFORE the AR-synthesis section: the per-family
    # train rows are a primary artifact (round-4 verdict done-criterion)
    # while the AR RTF has been stable since r2 — on a degraded/slow
    # platform the budget should sacrifice ar_synth first
    _section("family_matrix", 40.0, sec_families)

    _section("ar_synth", 45.0, sec_ar)

    # ---------------- batched serving throughput ----------------
    bs = 16
    audio_seconds = t * FRAME_SECONDS

    def sec_serve():
        # batch-16 forward, chained; audio-s of generated speech per
        # wall-second (the raw forward's saturated rate)
        text_b = jnp.tile(text, (bs, 1))
        pos_b = jnp.tile(pos_text, (bs, 1))
        src_mask_b, _ = create_masks(pos_b, None)
        d_target_b = jnp.tile(d_target, (bs, 1))

        @jax.jit
        def synth_b(params, batch_stats, text, src_mask, d_target, carry):
            text = text + (carry * 0).astype(jnp.int32)
            out = model.apply(
                {"params": params, "batch_stats": batch_stats,
                 "vq_stats": {}},
                text, src_mask, t, d_target, train=False)
            return jnp.sum(out.mel_post)

        def serve_chain(n):
            carry = jnp.zeros((), jnp.float32)
            for _ in range(n):
                carry = synth_b(state.params, state.batch_stats, text_b,
                                src_mask_b, d_target_b, carry)
            return float(carry)

        serve_chain(2)
        serve_s = slope_time(serve_chain, 8).per_iter
        serve_flops = xla_flops(
            synth_b, state.params, state.batch_stats, text_b, src_mask_b,
            d_target_b, jnp.zeros((), jnp.float32))
        _plausibility_guard("serve_batch16", serve_flops, serve_s)
        # the device-forward marginal slope: no sync, no mel host
        # transfer, no request handling — an upper bound for a
        # pipelined async server
        RESULTS["serve_fwd_marginal_audio_s_per_s"] = round(
            (bs * audio_seconds) / serve_s, 1)

    _section("serve_forward", 25.0, sec_serve)

    # headline serving number = the REAL TTSEngine end to end (orbax
    # restore -> AOT warmup -> batched synthesize incl. request padding
    # + mel transfer back to host), matching scripts/serve_bench.py;
    # isolated host-closed calls — what the blocking engine delivers
    import tempfile as _tempfile
    from transformer_tts_tpu.train import checkpoint as _ckpt
    eng_dir = _tempfile.mkdtemp(prefix="bench_engine_")
    _ckpt.save_checkpoint(eng_dir, state, 1, with_optimizer=False)
    with open(os.path.join(eng_dir, "hparams.py"), "w") as fh:
        fh.write("amp = True\nbatch_size = 16\n")
    texts16 = [list(rs.randint(1, hp.vocab_size, l)) for _ in range(bs)]

    def _engine_median_s(engine):
        engine.warmup()
        engine.synthesize(texts16)
        times = []
        for _ in range(9):
            t0 = time.perf_counter()
            engine.synthesize(texts16)
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    def sec_engine():
        from transformer_tts_tpu.infer.engine import TTSEngine
        engine = TTSEngine(eng_dir, batch_size=bs,
                           frames_per_phone=t // l, text_buckets=(l,))
        engine_s = _engine_median_s(engine)
        RESULTS.update({
            "serve_audio_s_per_s": round((bs * audio_seconds) / engine_s,
                                         1),
            "serve_engine_ms_per_batch16": round(engine_s * 1000, 1),
        })

    _section("serve_engine", 40.0, sec_engine)

    def sec_engine_int8():
        # same engine, weight-only int8 (infer/quantize.py): weights
        # stream from HBM as int8 + per-channel scale, dequant fused
        # in-jit — the win is HBM bandwidth on weight-bound signatures
        from transformer_tts_tpu.infer.engine import TTSEngine
        engine_q = TTSEngine(eng_dir, batch_size=bs,
                             frames_per_phone=t // l, text_buckets=(l,),
                             quantize="int8")
        engine_q_s = _engine_median_s(engine_q)
        RESULTS["serve_int8_audio_s_per_s"] = round(
            (bs * audio_seconds) / engine_q_s, 1)

    _section("serve_engine_int8", 40.0, sec_engine_int8)

    # ---------------- neural vocoder throughput ----------------
    # untrained V1-size generator (weights don't change the math):
    # batch-8 x 256 mel frames -> 8 x 2.97 s of 22.05 kHz audio per call
    voc_mel = jnp.zeros((8, 256, 80), jnp.float32)
    voc_box = {}

    def sec_vocoder():
        from transformer_tts_tpu.vocoder.generator import HiFiGANGenerator
        voc = HiFiGANGenerator(dtype=jnp.bfloat16)
        voc_params = jax.jit(voc.init)(rng, voc_mel)
        voc_box["params"] = voc_params

        @jax.jit
        def voc_fn(params, mel, carry):
            return jnp.sum(voc.apply(params, mel + carry * 0))

        def voc_chain(k):
            carry = jnp.zeros((), jnp.float32)
            for _ in range(k):
                carry = voc_fn(voc_params, voc_mel, carry)
            return float(carry)

        voc_chain(2)
        voc_s = slope_time(voc_chain, 8).per_iter
        voc_audio_s = 8 * 256 * voc.hop_length / 22050.0
        voc_flops = xla_flops(voc_fn, voc_params, voc_mel,
                              jnp.zeros((), jnp.float32))
        _plausibility_guard("vocoder", voc_flops, voc_s)
        RESULTS["vocoder_audio_s_per_s"] = round(voc_audio_s / voc_s, 1)

    _section("vocoder", 35.0, sec_vocoder)

    def sec_vocoder_istft():
        # iSTFT (Vocos-recipe) family: frame-rate ConvNeXt backbone +
        # OLA head — the fast generator (PERF_NOTES "Vocoder generators")
        from transformer_tts_tpu.vocoder.generator import ISTFTVocoder
        ivoc = ISTFTVocoder(dtype=jnp.bfloat16)
        ivoc_params = jax.jit(ivoc.init)(rng, voc_mel)

        @jax.jit
        def ivoc_fn(params, mel, carry):
            return jnp.sum(ivoc.apply(params, mel + carry * 0))

        def ivoc_chain(k):
            carry = jnp.zeros((), jnp.float32)
            for _ in range(k):
                carry = ivoc_fn(ivoc_params, voc_mel, carry)
            return float(carry)

        ivoc_chain(2)
        ivoc_s = slope_time(ivoc_chain, 8).per_iter
        ivoc_flops = xla_flops(ivoc_fn, ivoc_params, voc_mel,
                               jnp.zeros((), jnp.float32))
        _plausibility_guard("vocoder_istft", ivoc_flops, ivoc_s)
        RESULTS["vocoder_istft_audio_s_per_s"] = round(
            (8 * 256 * ivoc.hop_length / 22050.0) / ivoc_s, 1)

    _section("vocoder_istft", 25.0, sec_vocoder_istft)

    # ---------------- streaming time-to-first-audio ----------------
    # the latency capability: batch-1 engine + neural vocoder, warm
    # TTFA of synthesize_streaming (NAR forward + first vocoder window,
    # host-closed by the pcm chunk arriving). Exactness vs one-shot is
    # test-enforced (tests/test_streaming.py); this measures its price.
    def sec_streaming():
        if "params" not in voc_box:
            raise RuntimeError("vocoder section skipped/failed")
        from transformer_tts_tpu.infer.engine import TTSEngine
        import orbax.checkpoint as _ocp
        voc_dir = os.path.abspath(os.path.join(eng_dir, "voc_generator"))
        _ck = _ocp.StandardCheckpointer()
        _ck.save(voc_dir,
                 jax.device_get({"g_params": voc_box["params"]["params"]}))
        _ck.wait_until_finished()
        # streaming uses PREDICTED durations; the untrained predictor
        # emits ~0 frames -> no audio. Bias its output to ~t/l frames
        # per phone (weights don't change the math being timed).
        sp = jax.tree.map(lambda x: x, state.params)
        dp = sp["variance_adaptor"]["duration_predictor"]["linear_layer"]
        dp["bias"] = dp["bias"] + np.log(float(t // l))
        stream_dir = _tempfile.mkdtemp(prefix="bench_stream_")
        _ckpt.save_checkpoint(stream_dir, state.replace(params=sp), 1,
                              with_optimizer=False)
        with open(os.path.join(stream_dir, "hparams.py"), "w") as fh:
            fh.write("amp = True\nbatch_size = 16\n")
        streng = TTSEngine(stream_dir, batch_size=1,
                           frames_per_phone=t // l, text_buckets=(l,),
                           vocoder=voc_dir)
        stream_ids = list(rs.randint(1, hp.vocab_size, l))

        def ttfa_once():
            t0 = time.perf_counter()
            for ev in streng.synthesize_streaming(stream_ids,
                                                  chunk_frames=64):
                if ev["type"] == "audio":
                    # pcm is host np by construction (StreamingVocoder
                    # converts) — its arrival closes the timing
                    return time.perf_counter() - t0
            raise RuntimeError("streaming produced no audio chunks")

        ttfa_once()                    # compile batch-1 + window sigs
        ttfa_once()
        RESULTS["streaming_ttfa_ms"] = round(float(np.median(
            [ttfa_once() for _ in range(7)])) * 1000, 1)

    _section("streaming_ttfa", 50.0, sec_streaming)

    RESULTS["bench_wall_s"] = round(time.perf_counter() - _T0, 1)
    _emit()


if __name__ == "__main__":
    main()
