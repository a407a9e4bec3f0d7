"""Production serving engine: bucketed AOT compilation + batched synthesis.

Beyond-reference capability (the reference's synthesis CLIs are batch-1
scripts that jit on first use — test_fastspeech2.py:146-204). For serving,
shape surprises at request time are unacceptable, so the engine:

* restricts request shapes to the configured static buckets
  (hp.text_buckets x one mel budget per bucket) — the same
  recompile-avoidance contract the training data layer uses;
* ahead-of-time compiles every (batch, text_bucket) signature at startup
  (``warmup()``), so the first request is as fast as the thousandth;
* serves batched: requests are grouped per bucket and padded to the
  engine batch size, amortizing dispatch overhead across utterances;
* can ``export()`` each compiled signature as a serialized
  ``jax.export`` StableHLO artifact + manifest — a deployable unit that a
  serving binary can load without Python model code.

Serve-or-refuse over every model family (each architecture either runs
with its full synthesis semantics or the constructor raises — nothing
silently serves a degraded output):

* NAR FastSpeech2 — single forward;
* AR Transformer-TTS — batched KV-cached decode (the while_loop step is
  latency-bound, so batching is nearly free; PERF_NOTES "Inference");
* GST models — require a ``ref_mel`` style reference at construction
  (transformer.py:96-101 eval path); refused with instructions if absent;
* text-mel-mel joint (integrate) models — served through
  ``synthesize_integrate`` (the refined output, never the bare prenet);
* FS2 + mel-mel PostLowEnergy student — pass ``post_model=<ckpt dir>``;
  the refinement is fused into the jitted forward
  (``synthesize_fastspeech2_post``);
* Tacotron2 decoder / bare mel-mel snapshots — refused at construction
  (offline CLI paths).
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional, Sequence

import numpy as np


class TTSEngine:
    def __init__(self, load_dir: str, hp_file: Optional[str] = None, *,
                 epoch: Optional[int] = None, batch_size: int = 8,
                 frames_per_phone: int = 8,
                 text_buckets: Optional[Sequence[int]] = None,
                 vocoder: Optional[str] = None,
                 quantize: Optional[str] = None,
                 post_model: Optional[str] = None,
                 ref_mel: Optional[str] = None):
        import jax
        import jax.numpy as jnp
        from transformer_tts_tpu.config import is_nar_model, load_hparams
        from transformer_tts_tpu.data.readers import Normalizer
        from transformer_tts_tpu.train import checkpoint as ckpt
        from transformer_tts_tpu.train.trainer import (
            init_fastspeech2_state, init_transformer_state)

        if os.path.basename(load_dir).startswith(("epoch_", "average_")):
            hp_dir = os.path.dirname(load_dir)
        else:
            hp_dir = load_dir
        hp = load_hparams(hp_file or os.path.join(hp_dir, "hparams.py"))
        self.is_ar = not is_nar_model(hp.model)
        if self.is_ar and hp.decoder_type.lower() == "tacotron2":
            raise ValueError(
                "TTSEngine serves the transformer families; the "
                "tacotron2 decoder stays on the offline CLI path "
                "(cli/synthesize)")
        if hp.architecture == "mel-mel":
            raise ValueError(
                "a bare mel-mel PostLowEnergy snapshot is not a "
                "text-to-speech model; serve its FastSpeech2 teacher "
                "with post_model=<this dir>, or use cli/synthesize "
                "--post_model")
        self.is_integrate = hp.architecture == "text-mel-mel"
        if self.is_integrate and post_model is not None:
            raise ValueError(
                "text-mel-mel snapshots carry their post-model inside "
                "the joint checkpoint; drop post_model=")
        if hp.gst and ref_mel is None:
            raise ValueError(
                "GST models need a style reference per session: pass "
                "ref_mel=<path to a reference mel .npy> "
                "(transformer.py:96-101 eval semantics)")
        self.hp = hp
        self.batch_size = int(batch_size)
        self.frames_per_phone = int(frames_per_phone)
        self.text_buckets = tuple(sorted(text_buckets or hp.text_buckets))
        # x-vector models condition on a float speaker embedding per
        # request (spk_emb_type='x_vector', spk_emb_dim floats);
        # speaker-id models take int ids
        self.is_xvector = bool(
            hp.is_multi_speaker
            and (hp.spk_emb_type or "").lower() == "x_vector")
        self.spk_emb_dim = int(hp.spk_emb_dim or 0) if self.is_xvector \
            else 0

        rng = jax.random.PRNGKey(0)
        if self.is_ar:
            # batched KV-cached decode is latency-bound: b=8 costs the
            # same wall time as b=1 (docs/PERF_NOTES.md "Inference")
            model, state = init_transformer_state(hp, rng)
        else:
            model, state = init_fastspeech2_state(
                hp, rng, enable_post_model=self.is_integrate)
        self.model = model
        # full restore: BatchNorm running stats (conformer/GST) must be
        # the trained ones, not init — see checkpoint.restore_variables
        self.variables = ckpt.restore_variables(load_dir, state,
                                                epoch=epoch)
        # weight-only int8: weights live in HBM as int8 + per-channel
        # scale and expand inside jit (infer/quantize.py) — every
        # synthesis/streaming/export signature is quantization-
        # transparent, so nothing else here changes
        self.quantize = quantize
        self.quantize_stats = None
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(
                    f"quantize={quantize!r} unsupported (only 'int8')")
            from transformer_tts_tpu.infer.quantize import (
                quantization_stats, quantize_variables)
            qvars = quantize_variables(self.variables)
            self.quantize_stats = quantization_stats(
                self.variables["params"], qvars["params"])
            self.variables = qvars
        normalizer = Normalizer(hp.mean_file, hp.var_file, hp.mel_dim)
        mean, var = normalizer.arrays()
        self._mean = jnp.asarray(mean) if mean is not None else None
        self._var = jnp.asarray(var) if var is not None else None

        # GST: one NORMALIZED style reference for the serving session
        # (the reference's test path loads one mel and conditions every
        # utterance on it — transformer.py:96-101)
        self._ref_mel = None
        if ref_mel is not None:
            if not hp.gst:
                raise ValueError("ref_mel given but hp.gst is off")
            ref_np = normalizer(np.load(ref_mel).astype(np.float32))
            self._ref_mel = jnp.asarray(ref_np)[None]

        # FS2 + mel-mel student: the refinement runs INSIDE the jitted
        # synthesis program (synthesize_fastspeech2_post). The student
        # is built from ITS OWN snapshot hparams (version /
        # n_layer_post_model / phone_embed travel with the post ckpt),
        # not the teacher's.
        self._post = None
        if post_model is not None:
            if self.is_ar:
                raise ValueError(
                    "post_model refines FastSpeech2 outputs; the AR "
                    "families have their own causal postnet")
            from transformer_tts_tpu.train.post_trainers import (
                init_post_state)
            p_dir = post_model
            if os.path.basename(p_dir).startswith(("epoch_", "average_")):
                p_dir = os.path.dirname(p_dir)
            p_hp = load_hparams(os.path.join(p_dir, "hparams.py"))
            pmodel, p_state = init_post_state(p_hp, rng, self.model)
            p_params = ckpt.restore_params(post_model, p_state.params)
            self._post = (pmodel, {"params": p_params,
                                   "batch_stats": p_state.batch_stats,
                                   "vq_stats": p_state.vq_stats}, p_hp)

        # optional neural vocoder: requests get waveforms, not just mels.
        # Architecture comes from hp.vocoder_* (snapshot alongside the
        # acoustic model); jitted once, bucketed with the mel budget so
        # warmup covers every signature.
        self._vocoder = None
        if vocoder is not None:
            import functools
            from transformer_tts_tpu.infer.streaming import vocode_pinned
            from transformer_tts_tpu.vocoder.trainer import (
                build_vocoder, restore_generator_params)
            gen = build_vocoder(hp, train_dtype=jnp.float32)
            # fp32-pinned + process-wide jit cache shared with the
            # streaming path (streaming.vocode_pinned) so one-shot and
            # streamed windows are exact AND share compilations
            self._vocoder = (
                gen, functools.partial(vocode_pinned, gen),
                {"params": restore_generator_params(vocoder)})

    # ---------------- shapes ----------------

    def max_frames_for(self, text_bucket: int) -> int:
        from transformer_tts_tpu.data.batching import pick_bucket
        return pick_bucket(text_bucket * self.frames_per_phone,
                           self.hp.length_buckets,
                           multiple=self.hp.reduction_rate or 1)

    def _bucket_of(self, n_phones: int) -> int:
        from transformer_tts_tpu.data.batching import pick_bucket
        return pick_bucket(n_phones, self.text_buckets)

    # ---------------- compile / run ----------------

    def warmup(self, streaming: bool = False) -> dict:
        """AOT-compile every (batch_size, text_bucket) signature.

        ``streaming=True`` additionally drains one dummy
        ``synthesize_streaming`` request per bucket, compiling the
        batch-1 forward (NAR) / segment decode (AR) and the vocoder
        window signature, so the first streaming request's
        time-to-first-audio is the warm number (~ms, not compile time).
        Returns {bucket: compile_seconds}.
        """
        times = {}
        for b in self.text_buckets:
            t0 = time.time()
            # multi-speaker models trace a distinct signature with the
            # speaker array present — warm that one (requests without a
            # speaker fall back to it via speaker 0 / a zero x-vector)
            spk = self._default_speakers() \
                if self.hp.is_multi_speaker else None
            self._run_padded(np.ones((self.batch_size, b), np.int32),
                             np.ones((self.batch_size, b), np.int32),
                             spk)
            if self._vocoder is not None:
                import jax.numpy as jnp
                _, voc_apply, voc_vars = self._vocoder
                voc_apply(voc_vars, jnp.zeros(
                    (self.batch_size, self.max_frames_for(b),
                     self.hp.mel_dim), jnp.float32))
            if streaming:
                spk0 = None
                if self.hp.is_multi_speaker:
                    spk0 = 0 if not self.is_xvector else \
                        np.zeros((self.spk_emb_dim,), np.float32)
                for _ in self.synthesize_streaming([1] * b, spk0):
                    pass
            times[b] = time.time() - t0
        return times

    def _default_speakers(self) -> np.ndarray:
        if self.is_xvector:
            return np.zeros((self.batch_size, self.spk_emb_dim), np.float32)
        return np.zeros((self.batch_size,), np.int32)

    def _fill_speakers(self, idxs, speakers) -> np.ndarray:
        """Build the per-batch speaker array. Ids for speaker_id models;
        (spk_emb_dim,) float vectors for x-vector models. ``None``
        entries fall back to speaker 0 / the zero vector."""
        spk = self._default_speakers()
        if speakers is None:
            return spk
        for row, i in enumerate(idxs):
            s = speakers[i]
            if s is None:
                continue
            if self.is_xvector:
                v = np.asarray(s, np.float32).reshape(-1)
                if v.shape != (self.spk_emb_dim,):
                    raise ValueError(
                        f"x-vector model expects {self.spk_emb_dim}-d "
                        f"float speaker embeddings, got shape {v.shape} "
                        f"for request {i}")
                spk[row] = v
            else:
                if np.ndim(s) != 0:
                    raise ValueError(
                        "speaker_id model expects integer speaker ids, "
                        f"got array-shaped value for request {i}")
                spk[row] = int(s)
        return spk

    def _run_padded(self, text: np.ndarray, pos_text: np.ndarray,
                    speaker: Optional[np.ndarray] = None):
        import jax.numpy as jnp
        from transformer_tts_tpu.infer.synthesize import (
            synthesize_fastspeech2, synthesize_fastspeech2_post,
            synthesize_integrate, synthesize_transformer_tts)
        spk = None
        if self.hp.is_multi_speaker and speaker is not None:
            spk = jnp.asarray(speaker)
        max_frames = self.max_frames_for(text.shape[1])
        if self.is_ar:
            mel, mel_len = synthesize_transformer_tts(
                self.model, self.variables, jnp.asarray(text),
                jnp.asarray(pos_text), spk, ref_mel=self._ref_mel,
                mean=self._mean, var=self._var,
                max_steps=max_frames // (self.hp.reduction_rate or 1))
            return mel, mel_len, None
        if self.is_integrate:
            refined, _, mel_len, durations = synthesize_integrate(
                self.model, self.variables, jnp.asarray(text),
                jnp.asarray(pos_text), max_frames,
                spk_emb=spk, mean=self._mean, var=self._var)
            return refined, mel_len, durations
        if self._post is not None:
            pmodel, pvars, p_hp = self._post
            return synthesize_fastspeech2_post(
                self.model, pmodel, self.variables, pvars,
                jnp.asarray(text), jnp.asarray(pos_text), max_frames,
                version=p_hp.version,
                postnet_pred=self.hp.postnet_pred,
                mel_dim_post=p_hp.mel_dim_post,
                spk_emb=spk, mean=self._mean, var=self._var)
        mel, mel_len, durations = synthesize_fastspeech2(
            self.model, self.variables, jnp.asarray(text),
            jnp.asarray(pos_text), max_frames,
            spk, mean=self._mean, var=self._var)
        return mel, mel_len, durations

    def synthesize(self, texts: List[Sequence[int]],
                   speakers: Optional[Sequence] = None) -> List[dict]:
        """Synthesize a list of token-id sequences.

        ``speakers``: per-request conditioning — int ids for speaker-id
        models, (spk_emb_dim,) float vectors for x-vector models; None
        entries default to speaker 0 / the zero vector.

        Returns one dict per utterance:
        ``{"mel": (T, mel_dim) float32, "durations": (L,) int32}`` with
        padding trimmed.
        """
        out: List[Optional[dict]] = [None] * len(texts)
        order = sorted(range(len(texts)), key=lambda i: len(texts[i]))
        for lo in range(0, len(order), self.batch_size):
            idxs = order[lo: lo + self.batch_size]
            bucket = self._bucket_of(max(len(texts[i]) for i in idxs))
            bsz = self.batch_size
            text = np.zeros((bsz, bucket), np.int32)
            pos = np.zeros((bsz, bucket), np.int32)
            for row, i in enumerate(idxs):
                ids = np.asarray(texts[i], np.int32)
                text[row, :len(ids)] = ids
                pos[row, :len(ids)] = np.arange(1, len(ids) + 1)
            spk = None
            if self.hp.is_multi_speaker:
                # always pass the speaker array for multi-speaker models
                # (default 0 / zero x-vector) — a None here would trace a
                # SECOND signature the warmup never compiled
                spk = self._fill_speakers(idxs, speakers)
            mel, mel_len, durations = self._run_padded(text, pos, spk)
            audio = None
            if self._vocoder is not None:
                import jax.numpy as jnp
                gen, voc_apply, voc_vars = self._vocoder
                # vocode the still-on-device padded batch (one bucketed
                # signature, warmed); rows are sliced to length below
                audio = np.asarray(voc_apply(
                    voc_vars, jnp.asarray(mel, jnp.float32)))
            mel = np.asarray(mel, np.float32)   # device bf16 under amp
            mel_len = np.asarray(mel_len)
            if durations is not None:
                durations = np.asarray(durations)
            for row, i in enumerate(idxs):
                n = len(texts[i])
                out[i] = {"mel": mel[row, :int(mel_len[row])],
                          # AR has no per-phone durations (stop-token
                          # decode); serve an empty vector
                          "durations": (durations[row, :n]
                                        if durations is not None
                                        else np.zeros((0,), np.int32))}
                if audio is not None:
                    hop = self._vocoder[0].hop_length
                    out[i]["audio"] = audio[row,
                                            :int(mel_len[row]) * hop]
        return out  # type: ignore[return-value]

    # ---------------- streaming ----------------

    def synthesize_streaming(self, text, speaker=None, *,
                             chunk_frames: int = 64,
                             segment_steps: int = 32):
        """Stream one utterance: yields audio (or mel) chunks as they
        are ready, then an ``end`` event. Batch-1, latency-oriented —
        the batched ``synthesize`` is the throughput path.

        Events (dicts):
        * ``{"type": "audio", "start_sample": s, "pcm": float32 (n,)}``
          when the engine has a vocoder — the concatenated pcm equals
          the one-shot ``synthesize`` audio (exact; test_streaming.py);
        * ``{"type": "mel", "start_frame": f, "mel": (t, mel) float32}``
          without a vocoder (AR: per decode segment; NAR: one chunk);
        * ``{"type": "end", "mel_frames": L, "durations": (L_text,)}``.

        NAR models produce mel in one forward — streaming overlaps the
        vocoder windows with delivery. AR models decode in
        ``segment_steps``-step jitted segments, so the first chunk ships
        after ~``segment_steps`` decode steps instead of the full
        utterance.
        """
        import jax.numpy as jnp
        from transformer_tts_tpu.infer.streaming import (
            ARStream, StreamingVocoder)
        if self.is_integrate or self._post is not None:
            raise NotImplementedError(
                "streaming does not run the mel-mel refinement stage "
                "(it needs the full mel); use synthesize() for "
                "post-processed models")
        ids = np.asarray(list(text), np.int32)
        bucket = self._bucket_of(len(ids))
        txt = np.zeros((1, bucket), np.int32)
        pos = np.zeros((1, bucket), np.int32)
        txt[0, :len(ids)] = ids
        pos[0, :len(ids)] = np.arange(1, len(ids) + 1)
        spk = None
        if self.hp.is_multi_speaker:
            full = self._fill_speakers([0], [speaker]
                                       if speaker is not None else None)
            spk = jnp.asarray(full[:1])
        max_frames = self.max_frames_for(bucket)
        sv = None
        if self._vocoder is not None:
            gen, _, voc_vars = self._vocoder
            sv = StreamingVocoder(gen, voc_vars, chunk_frames=chunk_frames)

        if not self.is_ar:
            from transformer_tts_tpu.infer.synthesize import (
                synthesize_fastspeech2)
            mel, mel_len, durations = synthesize_fastspeech2(
                self.model, self.variables, jnp.asarray(txt),
                jnp.asarray(pos), max_frames, spk,
                mean=self._mean, var=self._var)
            n = int(mel_len[0])
            if sv is not None:
                for s, wav in sv.stream(mel[0], length=n):
                    yield {"type": "audio", "start_sample": s, "pcm": wav}
            else:
                yield {"type": "mel", "start_frame": 0,
                       "mel": np.asarray(mel[0, :n], np.float32)}
            yield {"type": "end", "mel_frames": n,
                   "durations": np.asarray(durations[0, :len(ids)])}
            return

        r = self.hp.reduction_rate or 1
        stream = ARStream(
            self.model, self.variables, txt, pos, spk,
            ref_mel=self._ref_mel,
            mean=self._mean, var=self._var, max_steps=max_frames // r,
            segment_steps=segment_steps)
        session = None
        if sv is not None and max_frames >= sv.window:
            session = sv.session(max_frames, batch=1,
                                 mel_dim=self.hp.mel_dim)
        chunks = [] if (sv is not None and session is None) else None
        for start_frame, mel_chunk in stream:
            if session is not None:
                for s, wav in session.feed(mel_chunk):
                    yield {"type": "audio", "start_sample": s,
                           "pcm": wav[0]}
            elif chunks is not None:
                chunks.append(mel_chunk)    # buffer too small to window
            else:
                yield {"type": "mel", "start_frame": start_frame,
                       "mel": mel_chunk[0]}
        n = int(stream.lengths[0])
        if session is not None:
            for s, wav in session.finish([n]):
                yield {"type": "audio", "start_sample": s, "pcm": wav[0]}
        elif chunks is not None:
            mel = np.concatenate(chunks, axis=1)
            for s, wav in sv.stream(mel[0], length=n):
                yield {"type": "audio", "start_sample": s, "pcm": wav}
        yield {"type": "end", "mel_frames": n,
               "durations": np.zeros((0,), np.int32)}

    # ---------------- export ----------------

    def export(self, out_dir: str) -> dict:
        """Serialize one StableHLO artifact per text bucket.

        Each artifact is a ``jax.export`` unit with the trained weights
        baked in as constants; a loader needs only
        ``jax.export.deserialize(bytes).call(text, pos_text)`` — no model
        code. Returns the manifest dict (also written as manifest.json).
        """
        import jax
        import jax.numpy as jnp
        from jax import export as jexport
        from transformer_tts_tpu.infer.synthesize import (
            synthesize_fastspeech2, synthesize_fastspeech2_post,
            synthesize_integrate, synthesize_transformer_tts)

        os.makedirs(out_dir, exist_ok=True)
        manifest = {"model": self.hp.model, "mel_dim": self.hp.mel_dim,
                    "batch_size": self.batch_size, "buckets": {},
                    "speaker_input": (
                        None if not self.hp.is_multi_speaker else
                        ("x_vector" if self.is_xvector else "speaker_id"))}
        stem = "transformer_tts" if self.is_ar else (
            "integrate" if self.is_integrate else (
                "fastspeech2_post" if self._post is not None
                else "fastspeech2"))
        for bucket in self.text_buckets:
            max_frames = self.max_frames_for(bucket)

            def fn(text, pos_text, spk=None, _mf=max_frames):
                if self.is_ar:
                    # a GST engine's style reference is baked into the
                    # artifact as a constant (one style per export)
                    return synthesize_transformer_tts(
                        self.model, self.variables, text, pos_text, spk,
                        ref_mel=self._ref_mel,
                        mean=self._mean, var=self._var,
                        max_steps=_mf // (self.hp.reduction_rate or 1))
                if self.is_integrate:
                    refined, _, mel_len, durations = synthesize_integrate(
                        self.model, self.variables, text, pos_text, _mf,
                        spk_emb=spk, mean=self._mean, var=self._var)
                    return refined, mel_len, durations
                if self._post is not None:
                    pmodel, pvars, p_hp = self._post
                    return synthesize_fastspeech2_post(
                        self.model, pmodel, self.variables, pvars,
                        text, pos_text, _mf, version=p_hp.version,
                        postnet_pred=self.hp.postnet_pred,
                        mel_dim_post=p_hp.mel_dim_post,
                        spk_emb=spk, mean=self._mean, var=self._var)
                return synthesize_fastspeech2(
                    self.model, self.variables, text, pos_text, _mf,
                    spk, mean=self._mean, var=self._var)

            shape = jax.ShapeDtypeStruct(
                (self.batch_size, bucket), jnp.int32)
            if self.hp.is_multi_speaker:
                spk_shape = jax.ShapeDtypeStruct(
                    (self.batch_size, self.spk_emb_dim), jnp.float32) \
                    if self.is_xvector else jax.ShapeDtypeStruct(
                        (self.batch_size,), jnp.int32)
                exp = jexport.export(jax.jit(fn))(shape, shape, spk_shape)
            else:
                exp = jexport.export(jax.jit(fn))(shape, shape)
            name = f"{stem}_b{self.batch_size}_l{bucket}.stablehlo"
            with open(os.path.join(out_dir, name), "wb") as fh:
                fh.write(exp.serialize())
            manifest["buckets"][str(bucket)] = {
                "file": name, "max_frames": max_frames,
                "platforms": list(exp.platforms)}
        if self._vocoder is not None:
            # one vocoder artifact per distinct mel budget: the full
            # deployable unit is then text -> mel -> waveform with no
            # Python model code. The fp32 matmul pin matches serving
            # (streaming.vocode_pinned), so artifact samples equal the
            # engine's (and therefore the streamed chunks').
            gen, _, voc_vars = self._vocoder
            budgets = sorted({self.max_frames_for(b)
                              for b in self.text_buckets})
            manifest["vocoder"] = {"hop_length": gen.hop_length,
                                   "budgets": {}}

            def vfn(mel):
                with jax.default_matmul_precision("float32"):
                    return gen.apply(voc_vars, mel)

            for mf in budgets:
                vshape = jax.ShapeDtypeStruct(
                    (self.batch_size, mf, self.hp.mel_dim), jnp.float32)
                exp = jexport.export(jax.jit(vfn))(vshape)
                name = f"vocoder_b{self.batch_size}_f{mf}.stablehlo"
                with open(os.path.join(out_dir, name), "wb") as fh:
                    fh.write(exp.serialize())
                manifest["vocoder"]["budgets"][str(mf)] = {
                    "file": name, "platforms": list(exp.platforms)}
        with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2)
        return manifest
