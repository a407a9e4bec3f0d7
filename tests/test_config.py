"""HParams contract tests."""

import pytest

from transformer_tts_tpu.config import HParams, load_hparams, is_nar_model


def test_defaults_match_reference_fill_variables():
    hp = HParams(batch_size=4)
    # spot-check the fill_variables contract (utils/utils.py:184-201)
    assert hp.positive_weight == 5.0
    assert hp.pitch_pred is True and hp.energy_pred is True
    assert hp.model == "Fastspeech2"
    assert hp.encoder_type == "transformer"
    assert hp.amp is True
    assert hp.clip == 1.0
    assert hp.mask_probability == 0.06
    assert hp.n_layer_post_model == 6
    assert hp.tail_alignment == "_alignment"


def test_from_file_and_override(tmp_path):
    f = tmp_path / "h.py"
    f.write_text("vocab_size = 99\nd_model_encoder = 128\nbatch_size = 2\n")
    hp = load_hparams(str(f))
    assert hp.vocab_size == 99
    assert hp.d_model_encoder == 128
    assert hp.mel_dim == 80           # default filled
    hp.override(vocab_size=100, nothing=None)
    assert hp.vocab_size == 100


def test_batch_size_xor_max_seqlen():
    with pytest.raises(ValueError):
        HParams(batch_size=4, max_seqlen=1000)


def test_deprecated_spkr_emb_rejected(tmp_path):
    f = tmp_path / "h.py"
    f.write_text("spkr_emb = 'encoder'\nbatch_size = 2\n")
    with pytest.raises(ValueError):
        load_hparams(str(f))


def test_x_vector_postprocess_default_dim():
    hp = HParams(batch_size=2, spk_emb_postprocess_type="x_vector")
    assert hp.spk_emb_dim_postprocess == 512   # utils.py:198-199


def test_snapshot_roundtrip(tmp_path):
    f = tmp_path / "h.py"
    f.write_text("vocab_size = 77\nbatch_size = 2\n")
    hp = load_hparams(str(f))
    dest = hp.snapshot(str(tmp_path / "save"))
    hp2 = load_hparams(dest)
    assert hp2.vocab_size == 77


def test_is_nar_model():
    assert is_nar_model("Fastspeech2")
    assert is_nar_model("SQFastspeech2")
    assert is_nar_model("lightspeech")
    assert not is_nar_model("Transformer")


def test_yaml_config_with_reference_sections(tmp_path):
    f = tmp_path / "h.yaml"
    f.write_text(
        "general:\n"
        "  architecture: text-mel\n"
        "  vocab_size: 99\n"
        "optimizer:\n"
        "  warmup_step: 1234\n"
        "  batch_size: 4\n"
        "network_conf:\n"
        "  dropouts:\n"
        "    dropout: 0.2\n"
        "spm_model: None\n")
    hp = load_hparams(str(f))
    assert hp.vocab_size == 99
    assert hp.warmup_step == 1234
    assert hp.dropout == 0.2
    assert hp.spm_model is None
