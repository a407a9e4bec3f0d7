"""Tacotron2-style decoder (zoneout-LSTM + location-sensitive attention).

Reference: ``Models/decoder.py:58-332`` (``Tacotron2Decoder``), selected by
``hp.decoder_type == 'tacotron2'`` (Models/transformer.py:86-87).

Structure per step (decoder.py:130-207):
  location attention: conv(k=31) over the CUMULATIVE alignment -> 128,
    + encoder proj + decoder-state proj -> tanh -> scalar logits ->
    softmax over encoder positions; context g = sum(alpha * e_outputs).
  prenet: Linear(mel->d) ReLU drop -> Linear(d->d) ReLU drop.
  two hand-rolled zoneout-LSTM cells (4d hidden) with the reference's
    gate squashing ``tanh(x/2)/2 + 1/2`` (a sigmoid re-derivation) and
    zoneout rate 0.1 at train / 0 at synthesis (decoder.py:162-189, 277).
  FrameProj(concat(s2, g)) -> mel * r frames; TokenProj -> r stop logits.
  Teacher forcing feeds the LAST frame of the current group
  (decoder.py:195); synthesis feeds back its own last frame and stops on
  ``(mean(sigmoid(stop)) > 0.5 or alpha[-1] > 0.85) and step > 10`` with a
  4-frame tail (decoder.py:326-330), capped at 500 steps.

The per-step Python loop becomes ``lax.scan`` (train) /
``lax.while_loop`` (synthesis). Dimensional contract: the reference
hard-codes ``g`` projections at 2*d_model (decoder.py:84,89) which only
type-checks when d_model_encoder == 2*d_model_decoder; we let flax infer
input dims so any encoder width works (documented deviation).

KNOWN REFERENCE BUGS (not replicated): ``self.vocab_size`` and
``self.imulti_speaker`` are referenced but never defined
(decoder.py:112,226) — the reference module crashes as shipped.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def _gate_sigmoid(x):
    """tanh(x/2)/2 + 1/2 == sigmoid(x), written as the reference does."""
    return jnp.tanh(x * 0.5) * 0.5 + 0.5


class Tacotron2State(NamedTuple):
    s1: jnp.ndarray
    c1: jnp.ndarray
    s2: jnp.ndarray
    c2: jnp.ndarray
    prev_frame: jnp.ndarray
    cumulate_alpha: jnp.ndarray


class Tacotron2Decoder(nn.Module):
    mel_dim: int
    d_model: int
    d_model_encoder: int
    reduction_rate: int = 2
    conv_kernel_size: int = 31
    dropout_prenet: float = 0.5
    zoneout_rate: float = 0.1
    spk_emb_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d, d4 = self.d_model, self.d_model * 4
        dense = lambda f, name, bias=True: nn.Dense(  # noqa: E731
            f, use_bias=bias, dtype=self.dtype, name=name)
        if self.spk_emb_dim is not None:
            if self.spk_emb_dim == 512:
                self.speaker_embeddings = dense(d, "speaker_embeddings")
            else:
                self.speaker_embeddings = nn.Embed(
                    self.spk_emb_dim, d, dtype=self.dtype,
                    name="speaker_embeddings")
            self.L_spkr2s1 = dense(d4, "L_spkr2s1")
            self.L_spkr2s2 = dense(d4, "L_spkr2s2")
            self.speaker_L_l1_es = dense(d4, "speaker_L_l1_es", bias=False)
        self.L_l1_ys = dense(d4 * 4, "L_l1_ys", bias=False)
        self.L_l1_ss = dense(d4 * 4, "L_l1_ss", bias=False)
        self.L_l1_gs = dense(d4 * 4, "L_l1_gs")
        self.L_l2_is = dense(d4 * 4, "L_l2_is", bias=False)
        self.L_l2_ss = dense(d4 * 4, "L_l2_ss")
        self.FrameProj = dense(self.mel_dim * self.reduction_rate,
                               "FrameProj")
        self.TokenProj = dense(self.reduction_rate, "TokenProj")
        self.Prenet1 = dense(self.d_model, "Prenet1")
        self.Prenet2 = dense(self.d_model, "Prenet2")
        self.AttentionConv = nn.Conv(
            32, (self.conv_kernel_size,), padding=15, use_bias=False,
            dtype=self.dtype, name="AttentionConv")
        self.AttentionConvProj = dense(128, "AttentionConvProj", bias=False)
        self.AttentionEncoderProj = dense(128, "AttentionEncoderProj")
        self.AttentionDecoderProj = dense(128, "AttentionDecoderProj",
                                          bias=False)
        self.AttentionSelfProj = dense(1, "AttentionSelfProj", bias=False)

    def _init_state(self, batch, input_len, spk_bias1, spk_bias2):
        d4 = self.d_model * 4
        z = jnp.zeros((batch, d4), self.dtype)
        return Tacotron2State(
            s1=z + spk_bias1, c1=z, s2=z + spk_bias2, c2=z,
            prev_frame=jnp.zeros((batch, self.mel_dim), self.dtype),
            cumulate_alpha=jnp.zeros((batch, input_len), jnp.float32))

    def _speaker(self, spk_emb):
        if self.spk_emb_dim is None or spk_emb is None:
            return None, 0.0, 0.0
        e = self.speaker_embeddings(spk_emb)
        return (e, nn.soft_sign(self.L_spkr2s1(e)),
                nn.soft_sign(self.L_spkr2s2(e)))

    def _step(self, state: Tacotron2State, e_outputs, e_mask, spk_e, *,
              train: bool, rng=None, subtract_max: bool = True):
        """One decoder step; returns (new_state, frames, stop, alpha)."""
        b, input_len, _ = e_outputs.shape
        attconv = self.AttentionConv(
            state.cumulate_alpha[:, :, None].astype(self.dtype))
        attconv = self.AttentionConvProj(attconv[:, :input_len, :])
        encproj = self.AttentionEncoderProj(e_outputs)
        decproj = self.AttentionDecoderProj(state.s2)[:, None, :]
        e = jnp.tanh(decproj + encproj + attconv)
        logits = self.AttentionSelfProj(e)[:, :, 0].astype(jnp.float32)
        if subtract_max:     # train path (decoder.py:138); synth skips it
            logits = logits - logits.max(axis=1, keepdims=True)
        expl = jnp.exp(logits)
        if e_mask is not None:
            expl = expl * e_mask
        alpha = expl / jnp.maximum(expl.sum(axis=1, keepdims=True), 1e-9)
        cumulate_alpha = state.cumulate_alpha + alpha
        g = jnp.einsum("bt,btd->bd", alpha.astype(e_outputs.dtype),
                       e_outputs)

        pre = nn.relu(self.Prenet1(state.prev_frame))
        if train and rng is not None:
            rng, r1 = jax.random.split(rng)
            keep = jax.random.bernoulli(r1, 1 - self.dropout_prenet,
                                        pre.shape)
            pre = jnp.where(keep, pre / (1 - self.dropout_prenet), 0.0)
        pre = nn.relu(self.Prenet2(pre))
        if train and rng is not None:
            rng, r2 = jax.random.split(rng)
            keep = jax.random.bernoulli(r2, 1 - self.dropout_prenet,
                                        pre.shape)
            pre = jnp.where(keep, pre / (1 - self.dropout_prenet), 0.0)

        rec = self.L_l1_ys(pre) + self.L_l1_ss(state.s1) + self.L_l1_gs(g)
        if spk_e is not None:
            rec = rec + nn.soft_sign(self.speaker_L_l1_es(spk_e))
        s1, c1 = self._zoneout_cell(rec, state.s1, state.c1, train, rng, 1)
        rec = self.L_l2_is(s1) + self.L_l2_ss(state.s2)
        s2, c2 = self._zoneout_cell(rec, state.s2, state.c2, train, rng, 2)

        proj_input = jnp.concatenate([s2, g.astype(s2.dtype)], axis=-1)
        frames = self.FrameProj(proj_input).reshape(
            b, self.reduction_rate, self.mel_dim)
        stop = self.TokenProj(proj_input)
        new_state = state._replace(
            s1=s1, c1=c1, s2=s2, c2=c2, cumulate_alpha=cumulate_alpha)
        return new_state, frames, stop, alpha

    def _zoneout_cell(self, rec, s_prev, c_prev, train, rng, salt):
        ingate, forgetgate, cellgate, outgate = jnp.split(rec, 4, axis=-1)
        i = _gate_sigmoid(ingate)
        f = _gate_sigmoid(forgetgate)
        cg = jnp.tanh(cellgate)
        o = _gate_sigmoid(outgate)
        c_new = f * c_prev + i * cg
        h_new = o * jnp.tanh(c_new)
        if train and rng is not None and self.zoneout_rate > 0:
            zr = jax.random.fold_in(rng, salt)
            keep_old = jax.random.bernoulli(zr, self.zoneout_rate,
                                            c_new.shape)
            c_new = jnp.where(keep_old, c_prev, c_new)
            h_new = jnp.where(keep_old, s_prev, h_new)
        return h_new, c_new

    def __call__(self, meltarget, e_outputs, spk_emb=None, *,
                 train: bool = True):
        """Teacher-forced forward (decoder.py:104-207).

        meltarget: (B, T, mel), T a multiple of r. Returns
        (frames (B, T, mel), stop (B, T/r * r), attention (B, steps, L)).
        """
        b, t, _ = meltarget.shape
        r = self.reduction_rate
        steps = t // r
        spk_e, sb1, sb2 = self._speaker(spk_emb)
        state = self._init_state(b, e_outputs.shape[1], sb1, sb2)
        base_rng = self.make_rng("dropout") if train else None

        # teacher frames: the last frame of each r-group feeds the next
        # step (decoder.py:184-186)
        teacher = meltarget[:, r - 1::r, :]               # (B, steps, mel)
        step_rngs = None
        if base_rng is not None:
            step_rngs = jax.vmap(
                lambda i: jax.random.fold_in(base_rng, i))(
                jnp.arange(steps))

        def one_step(state, rng, teacher_frame):
            state, frames, stop, alpha = self._step(
                state, e_outputs, None, spk_e, train=train, rng=rng,
                subtract_max=True)
            state = state._replace(prev_frame=teacher_frame)
            return state, frames, stop, alpha

        # step 0 runs eagerly (materializes the submodule params under
        # init — flax can't create params inside lax.scan); the
        # remaining steps run as ONE scanned XLA step. The previous
        # Python loop unrolled all T/r steps into the HLO: 512-step
        # compiles took ~20 minutes.
        state, f0, s0, a0 = one_step(
            state, step_rngs[0] if step_rngs is not None else None,
            teacher[:, 0])

        def body(carry, xs):
            state = carry
            rng, teacher_frame = xs
            state, frames, stop, alpha = one_step(state, rng,
                                                  teacher_frame)
            return state, (frames, stop, alpha)

        if steps > 1:
            xs = (step_rngs[1:] if step_rngs is not None
                  else jnp.zeros((steps - 1,), jnp.uint32),
                  jnp.swapaxes(teacher[:, 1:], 0, 1))
            if step_rngs is None:
                def body_norng(carry, xs):
                    state = carry
                    _, teacher_frame = xs
                    state, frames, stop, alpha = one_step(
                        state, None, teacher_frame)
                    return state, (frames, stop, alpha)
                _, (f_r, s_r, a_r) = jax.lax.scan(body_norng, state, xs,
                                                  unroll=8)
            else:
                # unroll=8: recovers most cross-step fusion (the fully
                # unrolled loop ran 169 vs 214 ms scanned) at ~1/64 the
                # unrolled compile time
                _, (f_r, s_r, a_r) = jax.lax.scan(body, state, xs,
                                                  unroll=8)
            # scan stacks along axis 0 = steps; frames are (B, r, mel)
            frames = jnp.concatenate(
                [f0[:, None], jnp.swapaxes(f_r, 0, 1)], axis=1)
            stops = jnp.concatenate(
                [s0[:, None], jnp.swapaxes(s_r, 0, 1)], axis=1)
            attention = jnp.concatenate(
                [a0[:, None], jnp.swapaxes(a_r, 0, 1)], axis=1)
        else:
            frames, stops = f0[:, None], s0[:, None]
            attention = a0[:, None]
        frames = frames.reshape(b, steps * r, self.mel_dim)
        stops = stops.reshape(b, steps * stops.shape[-1])
        attention = attention.reshape(b, steps, -1)
        return frames, stops, attention

    def synthesize(self, e_outputs, text_lengths=None, spk_emb=None,
                   max_steps: int = 500):
        """Greedy AR synthesis with the reference end rule (decoder.py:209-332)."""
        b, input_len, _ = e_outputs.shape
        r = self.reduction_rate
        e_mask = None
        if text_lengths is not None:
            e_mask = (jnp.arange(input_len)[None, :]
                      < text_lengths[:, None]).astype(jnp.float32)
        spk_e, sb1, sb2 = self._speaker(spk_emb)

        init = dict(
            state=self._init_state(b, input_len, sb1, sb2),
            frames=jnp.zeros((b, max_steps, r, self.mel_dim), jnp.float32),
            step=jnp.zeros((), jnp.int32),
            end_tail=jnp.full((), 4, jnp.int32),
            done=jnp.zeros((), bool),
            length=jnp.full((b,), max_steps, jnp.int32),
        )

        def cond(c):
            return jnp.logical_and(c["step"] < max_steps, ~c["done"])

        def body(c):
            state, frames, stop, alpha = self._step(
                c["state"], e_outputs, e_mask, spk_e, train=False,
                rng=None, subtract_max=False)
            state = state._replace(prev_frame=frames[:, r - 1, :])
            buf = jax.lax.dynamic_update_slice_in_dim(
                c["frames"], frames.astype(jnp.float32)[:, None],
                c["step"], axis=1)
            p_stop = jnp.mean(jax.nn.sigmoid(stop.astype(jnp.float32)),
                              axis=-1)
            end_now = jnp.logical_and(
                c["step"] > 10,
                jnp.logical_or(p_stop[0] > 0.5, alpha[0, -1] > 0.85))
            end_tail = jnp.where(end_now | (c["end_tail"] < 4),
                                 c["end_tail"] - 1, c["end_tail"])
            done = end_tail < 1
            length = jnp.where(done & (c["length"] == max_steps),
                               c["step"] + 1, c["length"])
            return dict(state=state, frames=buf, step=c["step"] + 1,
                        end_tail=end_tail, done=done, length=length)

        final = jax.lax.while_loop(cond, body, init)
        frames = final["frames"].reshape(b, max_steps * r, self.mel_dim)
        return frames, final["length"] * r
