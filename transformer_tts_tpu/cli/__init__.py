"""Command-line entry points.

Reference CLI surface (SURVEY.md §2.6) mapped onto this package:

  train.py / train_fastspeech2.py / train_fastspeech2_sq.py
  train_fastspeech2_dev.py / train_fastspeech2_dev_integrate_train.py
      -> python -m transformer_tts_tpu.cli.train --hp_file hparams.py
         (dispatches on hp.model + hp.architecture)
  test.py / test_fastspeech2.py / test_fastspeech2_dev*.py
      -> python -m transformer_tts_tpu.cli.synthesize --load_name <ckpt>
  average_checkpoints.py
      -> python -m transformer_tts_tpu.cli.average_checkpoints
  generate_teacher_forcing.py
      -> python -m transformer_tts_tpu.cli.teacher_forcing
  tools/parse_hparams.py
      -> python -m transformer_tts_tpu.cli.parse_hparams
"""
