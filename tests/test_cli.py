"""End-to-end CLI tests on a synthetic corpus (train -> avg -> synth)."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

MEL_DIM = 8


@pytest.fixture
def corpus(tmp_path):
    rs = np.random.RandomState(0)
    lines = []
    test_lines = []
    for i in range(6):
        t_text = rs.randint(4, 8)
        frames_per = 3
        t_mel = t_text * frames_per
        base = tmp_path / f"utt{i}.npy"
        np.save(base, rs.randn(t_mel, MEL_DIM).astype(np.float32))
        np.save(tmp_path / f"utt{i}_alignment.npy",
                np.full((t_text,), frames_per, np.int32))
        np.save(tmp_path / f"utt{i}_f0.npy",
                rs.rand(t_mel).astype(np.float32) * 300)
        np.save(tmp_path / f"utt{i}_energy.npy",
                rs.rand(t_mel).astype(np.float32) * 100)
        ids = " ".join(str(x) for x in rs.randint(1, 20, t_text))
        lines.append(f"{base}|{ids}")
        test_lines.append(f"{base}|{ids}")
    (tmp_path / "train.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(test_lines[:2]) + "\n")
    return tmp_path


def write_hp(tmp_path, corpus, **extra):
    save_dir = tmp_path / "ckpt"
    cfg = dict(
        architecture="text-mel", model="Fastspeech2", vocab_size=20,
        mel_dim=MEL_DIM, d_model_encoder=16, d_model_decoder=16,
        n_layer_encoder=1, n_layer_decoder=1, n_head_encoder=2,
        n_head_decoder=2, batch_size=3, max_epoch=2, save_per_epoch=1,
        warmup_step=10, amp=False,
        train_script=str(corpus / "train.txt"),
        test_script=str(corpus / "test.txt"),
        save_dir=str(save_dir),
        text_buckets=(8, 16), length_buckets=(32, 64),
    )
    cfg.update(extra)
    hp_path = tmp_path / "hparams.py"
    hp_path.write_text(
        "\n".join(f"{k} = {v!r}" for k, v in cfg.items()) + "\n")
    return str(hp_path), str(save_dir)


def test_train_synthesize_average_roundtrip(corpus, tmp_path):
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    from transformer_tts_tpu.cli import average_checkpoints as cli_avg
    from transformer_tts_tpu.cli import teacher_forcing as cli_tf

    hp_path, save_dir = write_hp(tmp_path, corpus, tb_images=True,
                                 save_attention_per_step=2)
    cli_train.main(["--hp_file", hp_path])
    assert os.path.isdir(os.path.join(save_dir, "epoch_1"))
    assert os.path.isdir(os.path.join(save_dir, "epoch_2"))
    # snapshot exists -> synthesis auto-discovers config
    assert os.path.exists(os.path.join(save_dir, "hparams.py"))
    # tb_images: attention/mel image summaries landed in the event file
    import glob as _glob
    ev = _glob.glob(os.path.join(save_dir, "logs",
                                 "events.out.tfevents.*"))
    assert ev and os.path.getsize(ev[0]) > 2000  # scalars alone ~ bytes
    with open(ev[0], "rb") as fh:
        assert b"\x89PNG" in fh.read()

    out_dir = str(tmp_path / "gen")
    cli_synth.main(["--load_name", save_dir, "--save", out_dir,
                    "--max_frames", "64"])
    assert os.path.exists(os.path.join(out_dir, "0.npy"))
    assert os.path.exists(os.path.join(out_dir, "0_alignment.npy"))

    cli_avg.main(["--save_dir", save_dir, "--start_epoch", "1",
                  "--end_epoch", "2"])
    avg_dir = os.path.join(save_dir, "average_epoch1-epoch2")
    assert os.path.isdir(avg_dir)
    out_dir2 = str(tmp_path / "gen_avg")
    cli_synth.main(["--load_name", avg_dir, "--save", out_dir2,
                    "--max_frames", "64"])
    assert os.path.exists(os.path.join(out_dir2, "0.npy"))

    tf_dir = str(tmp_path / "tf")
    cli_tf.main(["--load_name", save_dir, "--out_dir", tf_dir])
    gens = [f for f in os.listdir(tf_dir) if f.endswith("_gen.npy")]
    assert len(gens) == 6
    # teacher-forced mel has ground-truth length
    g0 = np.load(os.path.join(tf_dir, "utt0_gen.npy"))
    src = np.load(str(corpus / "utt0.npy"))
    assert g0.shape == src.shape


def test_resume_from_checkpoint(corpus, tmp_path):
    from transformer_tts_tpu.cli import train as cli_train
    hp_path, save_dir = write_hp(tmp_path, corpus, max_epoch=1)
    cli_train.main(["--hp_file", hp_path])
    hp_path2, _ = write_hp(tmp_path, corpus, max_epoch=2,
                           loaded_epoch=1, loaded_dir=str(save_dir))
    cli_train.main(["--hp_file", hp_path2])
    assert os.path.isdir(os.path.join(save_dir, "epoch_2"))


def test_parse_hparams_cli(corpus, tmp_path, capsys):
    from transformer_tts_tpu.cli import parse_hparams
    hp_path, _ = write_hp(tmp_path, corpus)
    parse_hparams.main(["--hp_file", hp_path, "--key", "vocab_size"])
    assert capsys.readouterr().out.strip() == "20"


def test_melmel_and_integrate_cli_paths(corpus, tmp_path):
    """text-mel pretrain -> mel-mel student train -> synth with post model;
    plus the text-mel-mel integrate trainer."""
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth

    # 1) pretrain a tiny FS2 teacher
    hp_path, save_dir = write_hp(tmp_path, corpus, max_epoch=1)
    cli_train.main(["--hp_file", hp_path])

    # 2) mel-mel student training on the frozen teacher
    post_dir = str(tmp_path / "post_ckpt")
    hp2, _ = write_hp(
        tmp_path, corpus, max_epoch=1,
        architecture="mel-mel", version=3, phone_embed=True,
        n_layer_post_model=1, pretrain_model=str(save_dir),
        save_dir=post_dir)
    cli_train.main(["--hp_file", hp2])
    assert os.path.isdir(os.path.join(post_dir, "epoch_1"))

    # 3) synthesis with the post model (residual v3)
    out_dir = str(tmp_path / "gen_post")
    cli_synth.main(["--load_name", save_dir, "--save", out_dir,
                    "--post_model", post_dir, "--max_frames", "64",
                    "--hp_file", hp2])
    assert os.path.exists(os.path.join(out_dir, "0.npy"))

    # 4) integrate (text-mel-mel) training — enough epochs that the
    #    duration predictor rounds to >= 1 frame/phone at inference
    #    (an untrained one predicts exp(0)-1 = 0 -> empty mels)
    int_dir = str(tmp_path / "int_ckpt")
    hp3, _ = write_hp(
        tmp_path, corpus, max_epoch=8,
        architecture="text-mel-mel", version=3, phone_embed=True,
        postnet_pred=False, n_layer_post_model=1, save_dir=int_dir)
    cli_train.main(["--hp_file", hp3])
    assert os.path.isdir(os.path.join(int_dir, "epoch_8"))

    # 5) integrate synthesis: one joint forward, post output residual-
    #    added onto the prenet mel, prenet mel saved alongside
    #    (test_fastspeech2_dev_integrate_train.py:107-220)
    import numpy as np
    int_out = str(tmp_path / "gen_int")
    cli_synth.main(["--load_name", int_dir, "--save", int_out,
                    "--max_frames", "64"])
    mel = np.load(os.path.join(int_out, "0.npy"))
    pre = np.load(os.path.join(int_out, "0_prenet.npy"))
    assert mel.shape == pre.shape and mel.shape[1] == MEL_DIM
    assert mel.shape[0] > 0              # predicted durations nonzero
    assert np.isfinite(mel).all()
    assert not np.allclose(mel, pre)     # post residual actually applied

    # 6) --save_prenet: main output IS the prenet mel
    int_out2 = str(tmp_path / "gen_int_prenet")
    cli_synth.main(["--load_name", int_dir, "--save", int_out2,
                    "--max_frames", "64", "--save_prenet"])
    mel2 = np.load(os.path.join(int_out2, "0.npy"))
    np.testing.assert_array_equal(
        mel2, np.load(os.path.join(int_out2, "0_prenet.npy")))


def test_sq_cli_path(corpus, tmp_path):
    from transformer_tts_tpu.cli import train as cli_train
    sq_dir = str(tmp_path / "sq_ckpt")
    hp_path, _ = write_hp(tmp_path, corpus, max_epoch=1,
                          model="SQFastspeech2", save_dir=sq_dir)
    cli_train.main(["--hp_file", hp_path])
    assert os.path.isdir(os.path.join(sq_dir, "epoch_1"))


def test_ar_transformer_cli_path(corpus, tmp_path):
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    ar_dir = str(tmp_path / "ar_ckpt")
    hp_path, _ = write_hp(tmp_path, corpus, max_epoch=1,
                          model="Transformer", reduction_rate=2,
                          ff_conv_kernel_size_decoder=1, save_dir=ar_dir)
    cli_train.main(["--hp_file", hp_path])
    assert os.path.isdir(os.path.join(ar_dir, "epoch_1"))
    out_dir = str(tmp_path / "gen_ar")
    cli_synth.main(["--load_name", ar_dir, "--save", out_dir])
    assert os.path.exists(os.path.join(out_dir, "0.npy"))


# weekly tier: tacotron2 decoder covered per-module by test_aux_models.py::test_tacotron2_decoder_teacher_forced
@pytest.mark.weekly
def test_tacotron2_decoder_cli_path(corpus, tmp_path):
    """decoder_type=tacotron2 train -> synth roundtrip
    (Models/transformer.py:86-87 / Models/decoder.py:58-332)."""
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    taco_dir = str(tmp_path / "taco_ckpt")
    hp_path, _ = write_hp(tmp_path, corpus, max_epoch=1,
                          model="Transformer", reduction_rate=2,
                          decoder_type="tacotron2", save_dir=taco_dir)
    cli_train.main(["--hp_file", hp_path])
    assert os.path.isdir(os.path.join(taco_dir, "epoch_1"))
    out_dir = str(tmp_path / "gen_taco")
    cli_synth.main(["--load_name", taco_dir, "--save", out_dir])
    assert os.path.exists(os.path.join(out_dir, "0.npy"))
    import numpy as np
    mel = np.load(os.path.join(out_dir, "0.npy"))
    assert mel.ndim == 2 and mel.shape[1] == MEL_DIM
    assert np.isfinite(mel).all()


def test_batched_synthesis(corpus, tmp_path):
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    hp_path, save_dir = write_hp(tmp_path, corpus, max_epoch=1)
    cli_train.main(["--hp_file", hp_path])
    out_b = str(tmp_path / "gen_batched")
    cli_synth.main(["--load_name", save_dir, "--save", out_b,
                    "--max_frames", "64", "--batch_size", "2"])
    out_1 = str(tmp_path / "gen_single")
    cli_synth.main(["--load_name", save_dir, "--save", out_1,
                    "--max_frames", "64", "--batch_size", "1"])
    for i in range(2):
        a = np.load(os.path.join(out_b, f"{i}.npy"))
        b = np.load(os.path.join(out_1, f"{i}.npy"))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_wav_writer_unit(tmp_path):
    """_write_wav: synthetic log-mel -> playable 16-bit WAV."""
    import wave
    from transformer_tts_tpu.cli.synthesize import _write_wav
    from transformer_tts_tpu.config import HParams
    hp = HParams(mel_dim=MEL_DIM, batch_size=1)
    mel = np.random.RandomState(0).randn(40, MEL_DIM).astype(np.float32)
    path = str(tmp_path / "x.wav")
    _write_wav(path, mel, hp, 22050, 256)
    with wave.open(path) as fh:
        assert fh.getframerate() == 22050
        assert fh.getnframes() == 39 * 256


def test_wav_flag_cli_smoke(corpus, tmp_path):
    """--wav runs end-to-end (untrained models may emit 0 frames, in
    which case no wav is written — both outcomes are valid here)."""
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    hp_path, save_dir = write_hp(tmp_path, corpus, max_epoch=1)
    cli_train.main(["--hp_file", hp_path])
    out_dir = str(tmp_path / "gen_wav")
    cli_synth.main(["--load_name", save_dir, "--save", out_dir,
                    "--max_frames", "64", "--wav"])
    assert os.path.exists(os.path.join(out_dir, "0.npy"))


# weekly tier: the bf16->f32 save cast is covered by test_serving/engine paths; this re-trains a full amp model
@pytest.mark.weekly
def test_synthesize_amp_outputs_are_float32_npy(corpus, tmp_path):
    """Under amp the device mel is bf16; saved .npy must be float32
    (raw-bf16 npy reads back as an uninterpretable void dtype)."""
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    hp_path, save_dir = write_hp(tmp_path, corpus, max_epoch=1, amp=True)
    cli_train.main(["--hp_file", hp_path])
    out_dir = str(tmp_path / "gen_amp")
    cli_synth.main(["--load_name", save_dir, "--save", out_dir])
    mel = np.load(os.path.join(out_dir, "0.npy"))
    assert mel.dtype == np.float32
    assert np.isfinite(mel).all()


def test_train_with_frame_budget_sampler(corpus, tmp_path):
    """hp.max_seqlen (batch_size unset): LengthsBatchSampler drives the
    real training loop, building/caching lengths.npy on first use."""
    from transformer_tts_tpu.cli import train as cli_train
    lengths_file = str(tmp_path / "lengths.npy")
    hp_path, save_dir = write_hp(
        tmp_path, corpus, max_epoch=1, batch_size=None, max_seqlen=64,
        lengths_file=lengths_file)
    cli_train.main(["--hp_file", hp_path])
    assert os.path.isdir(os.path.join(save_dir, "epoch_1"))
    lengths = np.load(lengths_file)
    assert lengths.shape == (6,) and (lengths > 0).all()
    # resume path under the same sampler
    cli_train.main(["--hp_file", hp_path, "--set", "max_epoch=2",
                    "--set", f"loaded_dir={save_dir}",
                    "--set", "loaded_epoch=1"])
    assert os.path.isdir(os.path.join(save_dir, "epoch_2"))


def test_gst_ref_mel_cli_path(corpus, tmp_path):
    """AR + GST: --ref_mel conditions synthesis on a reference mel's
    style (transformer.py:96-101 eval path)."""
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    hp_path, save_dir = write_hp(
        tmp_path, corpus, model="Transformer", max_epoch=1,
        reduction_rate=2, ff_conv_kernel_size_decoder=1, gst=True,
        save_dir=str(tmp_path / "gst_ckpt"))
    cli_train.main(["--hp_file", hp_path])
    ref = str(corpus / "utt0.npy")
    out_a = str(tmp_path / "gen_a")
    out_b = str(tmp_path / "gen_b")
    cli_synth.main(["--load_name", str(tmp_path / "gst_ckpt"),
                    "--save", out_a, "--ref_mel", ref])
    cli_synth.main(["--load_name", str(tmp_path / "gst_ckpt"),
                    "--save", out_b, "--ref_mel",
                    str(corpus / "utt3.npy")])
    a = np.load(os.path.join(out_a, "0.npy"))
    b = np.load(os.path.join(out_b, "0.npy"))
    assert a.dtype == np.float32 and np.isfinite(a).all()
    # a different style reference must change the output
    n = min(len(a), len(b))
    if n > 0:
        assert not np.allclose(a[:n], b[:n])


def test_xvector_multispeaker_cli_path(corpus, tmp_path):
    """x-vector conditioning: _xvector.npy siblings load through the
    data layer and condition FS2 training + synthesis
    (datasets_fastspeech2.py:19-44 / spk_emb_type='x_vector')."""
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    rs = np.random.RandomState(5)
    for i in range(6):
        np.save(corpus / f"utt{i}_xvector.npy",
                rs.randn(512).astype(np.float32))
    hp_path, save_dir = write_hp(
        tmp_path, corpus, max_epoch=1, is_multi_speaker=True,
        spk_emb_type="x_vector", spk_emb_dim=512,
        spk_emb_architecture=("encoder", "decoder"),
        save_dir=str(tmp_path / "xv_ckpt"))
    cli_train.main(["--hp_file", hp_path])
    out_dir = str(tmp_path / "gen_xv")
    cli_synth.main(["--load_name", str(tmp_path / "xv_ckpt"),
                    "--save", out_dir])
    mel = np.load(os.path.join(out_dir, "0.npy"))
    assert mel.dtype == np.float32 and np.isfinite(mel).all()


def test_accent_embedding_cli_path(corpus, tmp_path):
    """Accent tokens in the script's third field condition the encoder
    (encoder.py:92-97 accent_emb path) through train + synthesis."""
    from transformer_tts_tpu.cli import train as cli_train
    from transformer_tts_tpu.cli import synthesize as cli_synth
    rs = np.random.RandomState(7)
    # rewrite the scripts with per-phone accent ids in field 3
    for name in ("train.txt", "test.txt"):
        lines = (corpus / name).read_text().strip().split("\n")
        out = []
        for ln in lines:
            mel_path, ids = ln.split("|")[:2]
            n = len(ids.split(" "))
            acc = " ".join(str(x) for x in rs.randint(0, 5, n))
            out.append(f"{mel_path}|{ids}|{acc}")
        (tmp_path / name).write_text("\n".join(out) + "\n")
    hp_path, save_dir = write_hp(
        tmp_path, corpus, max_epoch=1, accent_emb=True,
        train_script=str(tmp_path / "train.txt"),
        test_script=str(tmp_path / "test.txt"),
        save_dir=str(tmp_path / "acc_ckpt"))
    cli_train.main(["--hp_file", hp_path])
    out_dir = str(tmp_path / "gen_acc")
    cli_synth.main(["--load_name", str(tmp_path / "acc_ckpt"),
                    "--save", out_dir])
    mel = np.load(os.path.join(out_dir, "0.npy"))
    assert mel.dtype == np.float32 and np.isfinite(mel).all()


def test_melmel_pregen_cli_path(corpus, tmp_path):
    """Pregenerated-corpus mel-mel training (hp.teacher_suffix): the
    reference's generate_teacher_forcing.py -> train_fastspeech2_dev.py
    workflow — cli/teacher_forcing --save_phone writes the corpus once,
    the student trains with NO teacher restore/forward in the step."""
    import numpy as np
    from transformer_tts_tpu.cli import synthesize as cli_synth
    from transformer_tts_tpu.cli import teacher_forcing as cli_tf
    from transformer_tts_tpu.cli import train as cli_train

    hp_path, save_dir = write_hp(tmp_path, corpus, max_epoch=1)
    cli_train.main(["--hp_file", hp_path])

    cli_tf.main(["--load_name", save_dir, "--save_phone"])
    assert os.path.exists(str(corpus / "utt0_gen.npy"))
    assert os.path.exists(str(corpus / "utt0_gen_phone.npy"))
    phone = np.load(str(corpus / "utt0_gen_phone.npy"))
    gen = np.load(str(corpus / "utt0_gen.npy"))
    assert phone.shape[0] == gen.shape[0] and phone.ndim == 2

    post_dir = str(tmp_path / "post_pregen")
    hp2, _ = write_hp(tmp_path, corpus, max_epoch=1,
                      architecture="mel-mel", version=3, phone_embed=True,
                      n_layer_post_model=1, teacher_suffix="_gen",
                      save_dir=post_dir)
    cli_train.main(["--hp_file", hp2])
    assert os.path.isdir(os.path.join(post_dir, "epoch_1"))

    out_dir = str(tmp_path / "gen_post_pregen")
    cli_synth.main(["--load_name", save_dir, "--save", out_dir,
                    "--post_model", post_dir, "--max_frames", "64",
                    "--hp_file", hp2])
    mel = np.load(os.path.join(out_dir, "0.npy"))
    assert np.isfinite(mel).all()
