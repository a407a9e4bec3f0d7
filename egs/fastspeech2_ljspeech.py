# FastSpeech 2 parity config (reference utils/default.yaml:49-88)
architecture = "text-mel"
model = "Fastspeech2"

train_script = "data/ljspeech/train.txt"
test_script = "data/ljspeech/test.txt"
mean_file = "data/ljspeech/mean.npy"
var_file = "data/ljspeech/var.npy"
lengths_file = "data/ljspeech/lengths.npy"

vocab_size = 152
mel_dim = 80

encoder_type = "transformer"
d_model_encoder = 384
n_layer_encoder = 6
n_head_encoder = 4
ff_conv_kernel_size_encoder = 5

decoder_type = "transformer"
d_model_decoder = 384
n_layer_decoder = 6
n_head_decoder = 4
ff_conv_kernel_size_decoder = 1
postnet_pred = True
reduction_rate = 1

optimizer = "Noam"
warmup_step = 4000
warmup_factor = 1.0
max_seqlen = 10000
# Frame-budget packing order: True (default) packs length-sorted for
# ~12%/frame tighter buckets on TPU; the reference packs in script
# order (datasets_fastspeech2.py:749-813). Set False for literal
# reference batch-composition parity (PARITY.md "Data layer").
sort_by_length = True
max_epoch = 200
save_per_epoch = 50
clip = 1.0
amp = True

pitch_pred = True
energy_pred = True
f0_min = 71.0
f0_max = 799.8
energy_min = 0.0
energy_max = 315.0
nbins = 256

save_dir = "checkpoints/fastspeech2_ljspeech"
