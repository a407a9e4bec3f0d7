"""Neural vocoder: generator/discriminator shapes, GAN train step,
checkpointing, and the train_vocoder -> synthesize --vocoder CLI loop.

The reference ships no vocoder (its README points at an external one);
this subsystem is beyond-parity, so every expectation here is defined by
our own contract (vocoder/generator.py): T mel frames -> T * hop samples,
hop = prod(upsample_rates).
"""

import os
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_tts_tpu.config import HParams

MEL_DIM = 8
TINY = dict(
    amp=False, mel_dim=MEL_DIM,
    vocoder_upsample_rates=(4, 2),            # hop 8
    vocoder_upsample_kernel_sizes=(8, 4),
    vocoder_channels=16,
    vocoder_resblock_kernel_sizes=(3,),
    vocoder_resblock_dilations=((1, 3),),
    vocoder_periods=(2, 3), vocoder_num_scales=2,
    vocoder_segment_size=128)
MEL_CFG = dict(sample_rate=800, n_fft=16, hop_length=8, n_mels=MEL_DIM)


def tiny_state(seed=0, **over):
    from transformer_tts_tpu.vocoder.trainer import init_vocoder_state
    hp = HParams(**{**TINY, **over})
    return hp, *init_vocoder_state(hp, jax.random.PRNGKey(seed),
                                   hp.vocoder_segment_size)


def sine_batch(bsz, n, rate=800, freq=55.0, seed=0):
    rs = np.random.RandomState(seed)
    t = np.arange(n) / rate
    out = np.stack([
        np.sin(2 * np.pi * freq * (1 + 0.1 * i) * t) * 0.5
        + rs.randn(n).astype(np.float32) * 0.01
        for i in range(bsz)])
    return jnp.asarray(out, jnp.float32)


# ---------------------------------------------------------------- shapes

@pytest.mark.parametrize("mode", ["subpixel", "transposed"])
def test_generator_shape_and_hop(mode):
    from transformer_tts_tpu.vocoder.generator import HiFiGANGenerator
    gen = HiFiGANGenerator(
        mel_dim=MEL_DIM, upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4), upsample_initial_channel=16,
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),),
        upsample_mode=mode)
    assert gen.hop_length == 8
    mel = jnp.zeros((2, 12, MEL_DIM))
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 12 * 8)
    assert wav.dtype == jnp.float32
    assert bool(jnp.all(jnp.abs(wav) <= 1.0))   # tanh output


def test_generator_bf16_policy_outputs_fp32():
    from transformer_tts_tpu.vocoder.trainer import build_vocoder
    hp = HParams(**{**TINY, "amp": True})
    gen = build_vocoder(hp)
    mel = jnp.zeros((1, 4, MEL_DIM))
    wav = gen.apply(gen.init(jax.random.PRNGKey(0), mel), mel)
    assert wav.dtype == jnp.float32


def test_discriminator_structure():
    from transformer_tts_tpu.vocoder.discriminator import (
        VocoderDiscriminator)
    disc = VocoderDiscriminator(periods=(2, 3), num_scales=2)
    audio = jnp.zeros((2, 128))
    outs = disc.apply(disc.init(jax.random.PRNGKey(0), audio), audio)
    assert len(outs) == 2 + 2                    # MPD scales + MSD scales
    for logits, fmaps in outs:
        assert logits.shape[0] == 2 and logits.ndim == 2
        assert len(fmaps) >= 3


# ----------------------------------------------------------- train step

@pytest.mark.slow          # compiles the full GAN step (~1 min cold)
def test_train_step_losses_finite_and_mel_improves():
    from transformer_tts_tpu.vocoder.trainer import (
        make_vocoder_train_step)
    hp, state, gen, disc = tiny_state()
    step = make_vocoder_train_step(gen, disc, hp, MEL_CFG)
    audio = sine_batch(2, hp.vocoder_segment_size)
    first = last = None
    for i in range(8):
        state, sc = step(state, audio, jax.random.PRNGKey(i))
        vals = {k: float(v) for k, v in sc.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        if first is None:
            first = vals["loss_mel"]
        last = vals["loss_mel"]
    assert last < first                           # reconstruction improves
    assert int(state.step) == 8


def test_checkpoint_roundtrip_and_generator_export(tmp_path):
    # saves the freshly-initialized GAN state: exercises the round trip
    # without compiling the (slow) train step — the post-step round trip
    # is covered by the slow CLI e2e below
    from transformer_tts_tpu.vocoder.trainer import (
        save_vocoder_checkpoint, restore_vocoder_checkpoint,
        export_generator, restore_generator_params)
    hp, state, gen, disc = tiny_state()
    state = state.replace(step=state.step + 1)
    save_vocoder_checkpoint(str(tmp_path), state, 1)

    _, fresh, _, _ = tiny_state(seed=1)
    restored = restore_vocoder_checkpoint(str(tmp_path), fresh)
    assert int(restored.step) == 1
    jax.tree.map(np.testing.assert_allclose, jax.device_get(
        restored.g_params), jax.device_get(state.g_params))

    path = export_generator(str(tmp_path), state)
    g = restore_generator_params(path)
    mel = jnp.zeros((1, 4, MEL_DIM))
    wav = gen.apply({"params": g}, mel)
    assert wav.shape == (1, 32)


# ------------------------------------------------------------- CLI e2e

@pytest.mark.slow
def test_cli_vocoder_train_then_neural_vocoded_synthesis(tmp_path):
    """train_vocoder on tiny sine wavs -> generator export ->
    synthesize --vocoder writes neural-vocoded WAVs (not Griffin-Lim)."""
    from transformer_tts_tpu.cli import train_vocoder as cli_voc
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth

    # wav corpus
    rate = 800
    wav_lines = []
    for i in range(3):
        n = 400 + 40 * i
        t = np.arange(n) / rate
        audio = (np.sin(2 * np.pi * 55.0 * (1 + 0.2 * i) * t)
                 * 0.5).astype(np.float32)
        p = tmp_path / f"w{i}.wav"
        with wave.open(str(p), "wb") as fh:
            fh.setnchannels(1)
            fh.setsampwidth(2)
            fh.setframerate(rate)
            fh.writeframes((audio * 32767).astype(np.int16).tobytes())
        wav_lines.append(str(p))
    (tmp_path / "wavs.txt").write_text("\n".join(wav_lines) + "\n")

    voc_save = tmp_path / "voc_ckpt"
    cfg = dict(TINY)
    cfg.update(save_dir=str(voc_save), log_dir=str(tmp_path / "voc_logs"),
               seed=3)
    hp_voc = tmp_path / "hp_voc.py"
    hp_voc.write_text("\n".join(f"{k} = {v!r}" for k, v in cfg.items())
                      + "\n")
    cli_voc.main(["--hp_file", str(hp_voc),
                  "--wav_script", str(tmp_path / "wavs.txt"),
                  "--max_steps", "3", "--batch_size", "2",
                  "--save_every", "3", "--sample_rate", str(rate),
                  "--n_fft", "16"])
    gen_export = voc_save / "generator"
    assert gen_export.is_dir()
    assert (voc_save / "vocoder_3").is_dir()

    # tiny TTS checkpoint to synthesize from (same corpus layout as
    # test_cli.py), hparams carry the vocoder architecture fields
    rs = np.random.RandomState(0)
    lines = []
    for i in range(3):
        t_text = 4
        t_mel = 12
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, MEL_DIM).astype(np.float32))
        np.save(tmp_path / f"utt{i}_alignment.npy",
                np.full((t_text,), 3, np.int32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text(lines[0] + "\n")
    tts_save = tmp_path / "tts_ckpt"
    tts_cfg = dict(
        architecture="text-mel", model="Fastspeech2", vocab_size=20,
        mel_dim=MEL_DIM, d_model_encoder=16, d_model_decoder=16,
        n_layer_encoder=1, n_layer_decoder=1, n_head_encoder=2,
        n_head_decoder=2, batch_size=3, max_epoch=1, save_per_epoch=1,
        warmup_step=10, amp=False,
        train_script=str(tmp_path / "train.txt"),
        test_script=str(tmp_path / "test.txt"),
        save_dir=str(tts_save),
        log_dir=str(tmp_path / "tts_logs"),
        text_buckets=(8,), length_buckets=(16, 32),
        # vocoder architecture rides in the acoustic hparams so
        # synthesize --vocoder builds the matching generator
        **{k: v for k, v in cfg.items() if k.startswith("vocoder_")})
    hp_tts = tmp_path / "hp_tts.py"
    hp_tts.write_text("\n".join(f"{k} = {v!r}"
                                for k, v in tts_cfg.items()) + "\n")
    cli_train.main(["--hp_file", str(hp_tts)])

    out_dir = tmp_path / "gen"
    cli_synth.main(["--load_name", str(tts_save), "--save", str(out_dir),
                    "--max_frames", "16", "--vocoder", str(gen_export),
                    "--sample_rate", str(rate)])
    wav_path = out_dir / "0.wav"
    assert wav_path.exists()
    mel = np.load(out_dir / "0.npy")
    with wave.open(str(wav_path), "rb") as fh:
        assert fh.getnframes() == mel.shape[0] * 8   # T * hop samples


@pytest.mark.slow          # compiles the GAN step
def test_finetune_step_uses_predicted_mel():
    """Fine-tune mode: the generator vocodes the *given* (predicted)
    mel; the reconstruction target stays the real audio's mel."""
    from transformer_tts_tpu.vocoder.trainer import (
        make_vocoder_train_step)
    hp, state, gen, disc = tiny_state()
    step = make_vocoder_train_step(gen, disc, hp, MEL_CFG,
                                   predicted_mel_inputs=True)
    audio = sine_batch(2, hp.vocoder_segment_size)
    n_frames = hp.vocoder_segment_size // gen.hop_length
    rs = np.random.RandomState(0)
    mel_pred = jnp.asarray(rs.randn(2, n_frames, MEL_DIM)
                           .astype(np.float32))
    s1, sc1 = step(state, audio, mel_pred, jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in sc1.values())
    # a different predicted mel must change the generator losses
    _, sc2 = step(s1, audio, mel_pred * 0.0, jax.random.PRNGKey(0))
    assert float(sc1["loss_mel"]) != float(sc2["loss_mel"])


@pytest.mark.slow
def test_cli_vocoder_finetune_on_predicted_mels(tmp_path):
    from transformer_tts_tpu.cli import train_vocoder as cli_voc
    rate = 800
    lines = []
    for i in range(2):
        n_frames = 40 + 8 * i
        n = n_frames * 8
        t = np.arange(n) / rate
        audio = (np.sin(2 * np.pi * 55.0 * t) * 0.5).astype(np.float32)
        wav_p = tmp_path / f"w{i}.wav"
        with wave.open(str(wav_p), "wb") as fh:
            fh.setnchannels(1)
            fh.setsampwidth(2)
            fh.setframerate(rate)
            fh.writeframes((audio * 32767).astype(np.int16).tobytes())
        mel_p = tmp_path / f"w{i}_gen.npy"   # teacher-forced mel stand-in
        np.save(mel_p, np.random.RandomState(i)
                .randn(n_frames, MEL_DIM).astype(np.float32))
        lines.append(f"{wav_p}|{mel_p}")
    (tmp_path / "pairs.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "wavs.txt").write_text(
        "\n".join(l.split("|")[0] for l in lines) + "\n")
    cfg = dict(TINY)
    cfg.update(save_dir=str(tmp_path / "ckpt"),
               log_dir=str(tmp_path / "logs"))
    hp_p = tmp_path / "hp.py"
    hp_p.write_text("\n".join(f"{k} = {v!r}" for k, v in cfg.items())
                    + "\n")
    cli_voc.main(["--hp_file", str(hp_p),
                  "--wav_script", str(tmp_path / "wavs.txt"),
                  "--mel_script", str(tmp_path / "pairs.txt"),
                  "--max_steps", "2", "--batch_size", "2",
                  "--save_every", "2", "--sample_rate", str(rate),
                  "--n_fft", "16"])
    assert (tmp_path / "ckpt" / "generator").is_dir()


# ------------------------------------------------------------- istft

def test_istft_generator_shape_and_dispatch():
    from transformer_tts_tpu.vocoder.trainer import build_vocoder
    from transformer_tts_tpu.vocoder.generator import ISTFTVocoder
    hp = HParams(**{**TINY, "vocoder_type": "istft",
                    "vocoder_istft_n_fft": 16,
                    "vocoder_convnext_channels": 16,
                    "vocoder_convnext_layers": 2,
                    "vocoder_convnext_mlp": 32})
    gen = build_vocoder(hp)
    assert isinstance(gen, ISTFTVocoder)
    assert gen.hop_length == 8               # prod(vocoder_upsample_rates)
    mel = jnp.asarray(
        np.random.RandomState(0).randn(2, 12, MEL_DIM), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), mel)
    wav = gen.apply(params, mel)
    assert wav.shape == (2, 12 * 8)
    assert wav.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(wav)))


def test_istft_unknown_type_rejected():
    from transformer_tts_tpu.vocoder.trainer import build_vocoder
    with pytest.raises(ValueError, match="vocoder_type"):
        build_vocoder(HParams(**{**TINY, "vocoder_type": "wavenet"}))


@pytest.mark.slow
def test_istft_gan_step_improves():
    """The same GAN step trains the iSTFT family (waveform-in/out
    contract shared with HiFiGANGenerator)."""
    from transformer_tts_tpu.vocoder.trainer import (
        make_vocoder_train_step)
    hp, state, gen, disc = tiny_state(
        vocoder_type="istft", vocoder_istft_n_fft=16,
        vocoder_convnext_channels=16, vocoder_convnext_layers=2,
        vocoder_convnext_mlp=32)
    step = make_vocoder_train_step(gen, disc, hp, MEL_CFG)
    audio = sine_batch(2, hp.vocoder_segment_size)
    first = last = None
    for i in range(8):
        state, sc = step(state, audio, jax.random.PRNGKey(i))
        vals = {k: float(v) for k, v in sc.items()}
        assert all(np.isfinite(v) for v in vals.values()), vals
        if first is None:
            first = vals["loss_mel"]
        last = vals["loss_mel"]
    assert last < first
